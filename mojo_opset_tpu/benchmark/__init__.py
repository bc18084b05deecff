from mojo_opset_tpu.benchmark.timing import device_sync, device_time_us
