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


def rebalance_replicated(
    loads: np.ndarray, num_devices: int, num_slots: int
) -> np.ndarray:
    """loads [E] -> placement [num_slots] with REPLICA slots.

    Counterpart of the reference's redundant-experts policy
    (eplb_policy.h:30-56, update_origin_weights(expert_loads,
    redundancy_experts)): a single too-hot expert that no permutation can
    balance gets extra physical slots; the router splits its tokens
    round-robin across them (ops/moe.py _replica_map).

    1. Give each of the num_slots - E extra slots to the expert with the
       highest per-replica load (greedy water-filling), then LOCAL-SEARCH
       the replica counts: a replica whose move to another expert lowers
       the placed imbalance migrates (water-filling alone over-replicates
       when replicas don't divide the device count — 3 copies of one hot
       expert across 2 devices lose to 2).
    2. LPT-place the slots (weight = load / replicas) onto devices,
       preferring a device that does not already hold that expert.
    """
    e = len(loads)
    extra = num_slots - e
    assert extra >= 0 and num_slots % num_devices == 0
    loads = np.asarray(loads, np.float64) + 1e-9  # all-zero windows
    reps = np.ones(e, np.int64)
    for _ in range(extra):
        reps[np.argmax(loads / reps)] += 1

    def place(reps):
        slot_experts = np.repeat(np.arange(e), reps)
        slot_loads = (loads / reps)[slot_experts]
        per_dev = num_slots // num_devices
        order = np.argsort(-slot_loads)
        dev_load = np.zeros(num_devices)
        dev_slots: list[list[int]] = [[] for _ in range(num_devices)]
        dev_has: list[set] = [set() for _ in range(num_devices)]
        for si in order:
            expert = int(slot_experts[si])
            cand = np.argsort(dev_load)
            open_devs = [
                dv for dv in cand if len(dev_slots[dv]) < per_dev
            ]
            # replicas of one expert spread across devices when possible
            pick = next(
                (dv for dv in open_devs if expert not in dev_has[dv]),
                open_devs[0],
            )
            dev_slots[pick].append(expert)
            dev_has[pick].add(expert)
            dev_load[pick] += slot_loads[si]
        placement = np.concatenate(
            [np.asarray(s, np.int32) for s in dev_slots]
        )
        mean = dev_load.mean()
        return placement, (dev_load.max() / mean if mean > 0 else 1.0)

    best_placement, best_imb = place(reps)
    for _ in range(2 * extra):
        improved = False
        donors = np.flatnonzero(reps > 1)
        for d in donors[np.argsort(loads[donors] / reps[donors])]:
            trial = reps.copy()
            trial[d] -= 1
            r = int(np.argmax(np.where(
                np.arange(e) == d, -np.inf, loads / (trial + 1))))
            trial[r] += 1
            p_t, imb_t = place(trial)
            if imb_t < best_imb - 1e-12:
                reps, best_placement, best_imb = trial, p_t, imb_t
                improved = True
                break
        if not improved:
            break
    return best_placement


def imbalance(loads: np.ndarray, placement: np.ndarray, num_devices: int) -> float:
    """max/mean per-device load under a placement (1.0 = perfect).

    With replica slots an expert's load divides evenly across its
    replicas (the router's round-robin split)."""
    s = len(placement)
    per_dev = s // num_devices
    reps = np.bincount(placement, minlength=len(loads))
    slot_load = loads[placement] / reps[placement]
    dev = slot_load.reshape(num_devices, per_dev).sum(axis=1)
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
        num_slots: int | None = None,  # physical slots (E + replicas)
    ):
        self.num_layers = num_layers
        self.num_experts = num_experts
        self.num_devices = num_devices
        self.num_slots = num_slots or num_experts
        assert self.num_slots >= num_experts
        self.rebalance_interval = rebalance_interval
        self.threshold = threshold
        self.loads = np.zeros((num_layers, num_experts), np.int64)
        # placement[l, slot] = logical expert stored in physical slot;
        # replica slots start as copies of experts 0..R-1 (matches
        # MoeDecoderModel.initial_expert_placement)
        base = np.arange(num_experts, dtype=np.int32)
        extra = np.arange(
            self.num_slots - num_experts, dtype=np.int32
        ) % num_experts
        self.placement = np.tile(
            np.concatenate([base, extra]), (num_layers, 1)
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
        """-> new placement [L, num_slots]; resets the window."""
        if self.num_slots > self.num_experts:
            new = np.stack(
                [
                    rebalance_replicated(
                        self.loads[l], self.num_devices, self.num_slots
                    )
                    for l in range(self.num_layers)
                ]
            )
        else:
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
