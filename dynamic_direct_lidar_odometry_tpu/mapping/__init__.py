from dynamic_direct_lidar_odometry_tpu.mapping import mapper  # noqa: F401
