"""EPLB: expert-parallel load balancing.

Counterpart of the reference's EplbManager/EplbPolicy/EplbExecutor
(reference xllm/core/framework/eplb/eplb_manager.h:28, eplb_policy.h:28,
eplb_executor.h:29; engine hooks llm_engine.cpp:942-945): per-step expert
token loads are accumulated on device, periodically fetched, and a
rebalancing policy computes a new expert -> physical-slot placement; the
runner then permutes the expert weight stacks and the router's expert ids
map through the placement (reference's async weight shuffling, done here
between steps since weights are jit operands).

TPU-native notes: with EP sharded over the mesh's tp axis, physical slot
s lives on device s // (E/ep); balancing the per-SLOT load balances the
per-device load. The permutation is applied with one jitted take() per
stack — no shm buffers or background threads needed.
"""

from __future__ import annotations

import numpy as np


def rebalance_greedy(loads: np.ndarray, num_devices: int) -> np.ndarray:
    """loads [E] -> placement perm [E]: placement[slot] = expert id.

    Greedy LPT: heaviest experts first, each to the currently lightest
    device (reference EplbPolicy::rebalance_experts). Slots within a
    device are contiguous; returns, per physical slot, the LOGICAL expert
    stored there.
    """
    e = len(loads)
    per_dev = e // num_devices
    order = np.argsort(-loads)  # heaviest first
    dev_load = np.zeros(num_devices)
    dev_slots: list[list[int]] = [[] for _ in range(num_devices)]
    for expert in order:
        cand = np.argsort(dev_load)
        for dv in cand:
            if len(dev_slots[dv]) < per_dev:
                dev_slots[dv].append(int(expert))
                dev_load[dv] += loads[expert]
                break
    placement = np.concatenate([np.asarray(s, np.int32) for s in dev_slots])
    return placement


def imbalance(loads: np.ndarray, placement: np.ndarray, num_devices: int) -> float:
    """max/mean per-device load under a placement (1.0 = perfect)."""
    e = len(placement)
    per_dev = e // num_devices
    dev = loads[placement].reshape(num_devices, per_dev).sum(axis=1)
    mean = dev.mean()
    return float(dev.max() / mean) if mean > 0 else 1.0


class EplbManager:
    """Tracks per-layer expert loads and decides when to re-place.

    Pure host logic (reference EplbManager thread, collapsed into the
    engine step loop); the runner applies decisions.
    """

    def __init__(
        self,
        num_layers: int,
        num_experts: int,
        num_devices: int,
        rebalance_interval: int = 256,
        threshold: float = 1.25,
    ):
        self.num_layers = num_layers
        self.num_experts = num_experts
        self.num_devices = num_devices
        self.rebalance_interval = rebalance_interval
        self.threshold = threshold
        self.loads = np.zeros((num_layers, num_experts), np.int64)
        # placement[l, slot] = logical expert stored in physical slot
        self.placement = np.tile(
            np.arange(num_experts, dtype=np.int32), (num_layers, 1)
        )
        self.steps = 0
        self.rebalances = 0

    def record(self, step_loads: np.ndarray) -> None:
        """Accumulate [L, E] per-step expert token counts (LOGICAL ids)."""
        self.loads += step_loads.astype(np.int64)
        self.steps += 1

    def should_rebalance(self) -> bool:
        if self.steps < self.rebalance_interval:
            return False
        worst = max(
            imbalance(self.loads[l], self.placement[l], self.num_devices)
            for l in range(self.num_layers)
        )
        return worst > self.threshold

    def compute_placement(self) -> np.ndarray:
        """-> new placement [L, E]; resets the accumulation window."""
        new = np.stack(
            [
                rebalance_greedy(self.loads[l], self.num_devices)
                for l in range(self.num_layers)
            ]
        )
        self.placement = new
        self.loads[:] = 0
        self.steps = 0
        self.rebalances += 1
        return new
