from lang2seg_tpu.data.synthetic import synthetic_batch, synthetic_test_batch  # noqa: F401
