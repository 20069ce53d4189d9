from dynamic_direct_lidar_odometry_tpu.parallel import sharding  # noqa: F401
