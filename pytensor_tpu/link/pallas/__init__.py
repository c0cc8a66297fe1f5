from pytensor_tpu.link.pallas.scan_pallas import make_pallas_scan_fn  # noqa: F401
