from ivf_tpu.data.catalogs import (
    ListData,
    SmthSmthCatalog,
    FrameDirCatalog,
    KTHDirCatalog,
)
from ivf_tpu.data.samplers import (
    sample_all,
    sample_fixed_count,
    sample_cohesive_crop,
)
from ivf_tpu.data.records import RecordWriter, RecordReader
from ivf_tpu.data.loaders import FrameDirDataset, KTHFrameDataset, ClipLoader

__all__ = [
    "ListData",
    "SmthSmthCatalog",
    "FrameDirCatalog",
    "KTHDirCatalog",
    "sample_all",
    "sample_fixed_count",
    "sample_cohesive_crop",
    "RecordWriter",
    "RecordReader",
    "FrameDirDataset",
    "KTHFrameDataset",
    "ClipLoader",
]
