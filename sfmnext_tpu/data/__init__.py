from sfmnext_tpu.data.synthetic import SyntheticDriveDataset, make_batch  # noqa: F401
