"""zen_tpu.drivers"""
