from hydragen_tpu.utils.misc import dtype_map, mean, rdiff, std
from hydragen_tpu.utils.timing import timed
from hydragen_tpu.utils.results import (
    MicrobenchmarkResult,
    NeedlesBenchmarkResult,
    SynthBenchmarkResult,
    dataclass_from_dict,
    dataclass_to_dict,
    load_yaml_dataclass,
    save_yaml_dataclass,
    split_range,
)

__all__ = [
    "rdiff",
    "mean",
    "std",
    "dtype_map",
    "timed",
    "MicrobenchmarkResult",
    "SynthBenchmarkResult",
    "NeedlesBenchmarkResult",
    "dataclass_to_dict",
    "dataclass_from_dict",
    "save_yaml_dataclass",
    "load_yaml_dataclass",
    "split_range",
]
