from cu2rec_tpu.data.ratings import (
    RatingsData, read_ratings_csv, read_array, load_matrix, write_csv,
    write_component, component_path, write_ratings_csv,
)
from cu2rec_tpu.data.csr import CSRRatings, DeviceRatings, build_csr, \
    csr_from_arrays, to_device

__all__ = [
    "RatingsData", "read_ratings_csv", "read_array", "load_matrix",
    "write_csv", "write_component", "component_path", "write_ratings_csv",
    "CSRRatings", "DeviceRatings", "build_csr", "csr_from_arrays",
    "to_device",
]
