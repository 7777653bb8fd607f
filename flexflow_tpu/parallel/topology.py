"""ICI torus topology model: collective cost estimation over the mesh.

TPU-native analog of the reference's network topology simulator
(/root/reference/src/runtime/network.cc:47,481,577 — shortest-path/ECMP
routing over generated topologies, feeding the Unity search's transfer-cost
estimates). TPU pods are fixed 2D/3D tori with per-link ICI bandwidth, so
the general routing simulator collapses to closed-form ring-collective
costs per mesh axis (the scaling-book model):

- all_reduce:      2 * (k-1)/k * bytes / link_bw   (reduce-scatter + all-gather)
- all_gather:          (k-1)/k * bytes / link_bw
- reduce_scatter:      (k-1)/k * bytes / link_bw
- ppermute (1 hop):            bytes / link_bw

A mesh axis that exceeds the torus (multi-host slice) pays DCN bandwidth
instead. ``Layout`` axes are greedily assigned to physical torus axes,
largest-traffic first, and ``flexflow_tpu.parallel.auto.analytic_cost``
consumes these costs when a topology is attached to its MachineModel.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

# per-link, per-direction ICI bytes/s
V5E_LINK = 4.5e10  # v5e 2D torus
V4_LINK = 9.0e10   # v4 3D torus
DCN_BW = 2.5e10    # inter-slice data-center network per host


@dataclasses.dataclass(frozen=True)
class TorusTopology:
    """A TPU slice: per-axis device counts + per-link bandwidth."""

    dims: Tuple[int, ...] = (4, 4)  # v5e-16 2D torus
    link_bw: float = V5E_LINK
    dcn_bw: float = DCN_BW
    wraparound: bool = True  # full torus (vs mesh edge) per axis

    @property
    def num_devices(self) -> int:
        return math.prod(self.dims)

    def _ring_bw(self, k: int) -> float:
        """Effective per-device ring bandwidth for a k-device axis.

        On a wraparound torus axis a ring uses both directions
        (bidirectional links) when k equals the physical axis length; a
        sub-axis ring or a mesh edge gets one direction."""
        if self.wraparound and k in self.dims:
            return 2.0 * self.link_bw
        return self.link_bw

    def fits(self, k: int) -> bool:
        """Can a k-device mesh axis ride ICI (vs spilling to DCN)?"""
        return k <= self.num_devices

    def all_reduce_time(self, nbytes: float, k: int) -> float:
        if k <= 1:
            return 0.0
        bw = self._ring_bw(k) if self.fits(k) else self.dcn_bw
        return 2.0 * (k - 1) / k * nbytes / bw

    def all_gather_time(self, nbytes: float, k: int) -> float:
        """``nbytes`` = the GATHERED (full) buffer size."""
        if k <= 1:
            return 0.0
        bw = self._ring_bw(k) if self.fits(k) else self.dcn_bw
        return (k - 1) / k * nbytes / bw

    reduce_scatter_time = all_gather_time

    def ppermute_time(self, nbytes: float) -> float:
        """One neighbor hop (pipeline stage boundary)."""
        return nbytes / self.link_bw

    def assign_axes(self, axis_sizes: Dict[str, int]) -> Dict[str, bool]:
        """Greedily place mesh axes on physical torus axes.

        Returns {axis_name: rides_ici}. Axes are placed largest first on
        the remaining torus capacity; overflow spills to DCN (multi-host).
        """
        capacity = self.num_devices
        placement = {}
        for name, k in sorted(axis_sizes.items(), key=lambda kv: -kv[1]):
            if k <= 1:
                placement[name] = True
                continue
            if capacity % k == 0 and capacity >= k:
                placement[name] = True
                capacity //= k
            else:
                placement[name] = False
        return placement


V5E_16 = TorusTopology(dims=(4, 4), link_bw=V5E_LINK)
V5E_64 = TorusTopology(dims=(8, 8), link_bw=V5E_LINK)
V4_64 = TorusTopology(dims=(4, 4, 4), link_bw=V4_LINK)
