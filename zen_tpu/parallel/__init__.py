"""zen_tpu.parallel"""
