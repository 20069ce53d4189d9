from dynamic_direct_lidar_odometry_tpu.utils import (  # noqa: F401
    checkpoint,
    profiling,
    trajectory,
)
