"""Example model zoo (reference ``elfi/examples/``).  Each module exposes
``get_model(...) -> elfi_tpu.Model``."""
