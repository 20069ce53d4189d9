from dynamic_direct_lidar_odometry_tpu.core import se3, cloud  # noqa: F401
