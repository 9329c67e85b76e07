"""Tuning-configuration system.

TPU-native analog of the reference's two config layers:

* CUB's per-SM chained tuning policies — digit width / items-per-thread
  tables selected by hardware generation
  (``lsb/cub/cub/device/dispatch/dispatch_radix_sort.cuh:467-744``), and
* the MSB project's compile-time ``RadixSortConfig<KEY_SIZE, VALUE_SIZE>``
  TPB/KPT tables plus runtime local-sort kernel registries
  (``msb/src/sort/gpu_sort_config.h:146-336``).

Here the tunables are the knobs that matter on TPU: radix width per pass,
tile size (the VMEM-resident unit of the local phase), padded sub-bucket
capacity factor for the digit-major exchange, and algorithm-selection
thresholds.  Configs are keyed by (key_bits, has_values, platform) and can
be overridden per call.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict, Optional, Tuple

__all__ = ["SortConfig", "get_config", "register_config"]


@dataclass(frozen=True)
class SortConfig:
    # --- LSD engine ---
    radix_bits: int = 8            # digit width per pass
    tile_elems: int = 2048         # keys per tile in the local phase (VMEM unit)
    pad_factor: float = 2.0        # padded (tile,digit) capacity = pad*tile/R
    # --- small-problem fast path (analog of CUB InvokeSingleTile,
    #     dispatch_radix_sort.cuh:834-875) ---
    small_n_threshold: int = 4096
    # --- MSD hybrid engine ---
    msd_radix_bits: int = 8
    msd_leaf_elems: int = 16384    # buckets at/below this finish with a leaf sort
    # --- algorithm auto-selection ---
    default_algorithm: str = "xla"


_REGISTRY: Dict[Tuple[int, bool, str], SortConfig] = {}


def register_config(key_bits: int, has_values: bool, platform: str, cfg: SortConfig):
    _REGISTRY[(key_bits, has_values, platform)] = cfg


def get_config(
    key_bits: int, has_values: bool, platform: Optional[str] = None
) -> SortConfig:
    if platform is None:
        import jax

        platform = jax.default_backend()
    for key in (
        (key_bits, has_values, platform),
        (key_bits, has_values, "*"),
    ):
        if key in _REGISTRY:
            return _REGISTRY[key]
    return SortConfig()


# Defaults. TPU tiles are sized so the local phase (keys + values + digit
# scratch) stays comfortably VMEM-resident; CPU (test) tiles are smaller to
# keep the 8-virtual-device test mesh fast.
register_config(32, False, "tpu", SortConfig(radix_bits=8, tile_elems=4096,
                                              default_algorithm="msd"))
register_config(32, True, "tpu", SortConfig(radix_bits=8, tile_elems=4096,
                                             default_algorithm="msd"))
register_config(64, False, "tpu", SortConfig(radix_bits=8, tile_elems=2048,
                                              default_algorithm="msd"))
register_config(64, True, "tpu", SortConfig(radix_bits=8, tile_elems=2048,
                                             default_algorithm="msd"))
register_config(32, False, "cpu", SortConfig(radix_bits=8, tile_elems=1024))
register_config(32, True, "cpu", SortConfig(radix_bits=8, tile_elems=1024))
register_config(64, False, "cpu", SortConfig(radix_bits=8, tile_elems=1024))
register_config(64, True, "cpu", SortConfig(radix_bits=8, tile_elems=1024))
