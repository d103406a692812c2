"""zen_tpu.runtime"""
