"""Global (cross-instance) KV block store: service CRUD, three-tier
controller, and cross-engine prefix reuse (reference kv_cache_store.h:26,
docs/en/features/global_kvcache.md)."""

import asyncio
import threading

import numpy as np

from xllm_tpu.disagg.kv_store import (
    GlobalKVController,
    KVStoreClient,
    make_kv_store_app,
)
from xllm_tpu.framework.block_manager import BlockManager
from xllm_tpu.framework.host_kv import HostKVPool
from xllm_tpu.framework.request import Request
from xllm_tpu.framework.sampling_params import SamplingParams


class StoreNode:
    """Run the store app on a real port in a background loop thread."""

    def __init__(self, max_blocks=64):
        self.loop = asyncio.new_event_loop()
        self.thread = threading.Thread(target=self.loop.run_forever, daemon=True)
        self.thread.start()
        self.max_blocks = max_blocks
        self.url = asyncio.run_coroutine_threadsafe(
            self._start(), self.loop
        ).result(timeout=10)

    async def _start(self):
        from aiohttp import web

        self.runner = web.AppRunner(make_kv_store_app(self.max_blocks))
        await self.runner.setup()
        site = web.TCPSite(self.runner, "127.0.0.1", 0)
        await site.start()
        port = site._server.sockets[0].getsockname()[1]
        return f"http://127.0.0.1:{port}"

    def stop(self):
        asyncio.run_coroutine_threadsafe(
            self.runner.cleanup(), self.loop
        ).result(timeout=10)
        self.loop.call_soon_threadsafe(self.loop.stop)
        self.thread.join(timeout=5)


def test_store_service_crud():
    node = StoreNode(max_blocks=2)
    try:
        c = KVStoreClient(node.url)
        k1 = np.arange(12, dtype=np.float32).reshape(3, 4)
        v1 = k1 * 2
        assert c.batch_put({101: (k1, v1)}) == 1
        assert c.batch_exist([101, 202]) == [True, False]
        got = c.batch_get([101, 202])
        assert set(got) == {101}
        np.testing.assert_array_equal(got[101][0], k1)
        np.testing.assert_array_equal(got[101][1], v1)
        # LRU bound: 3rd distinct key evicts the oldest
        c.batch_put({202: (k1, v1)})
        c.batch_put({303: (k1, v1)})
        assert c.batch_exist([101, 202, 303]) == [False, True, True]
        assert c.batch_remove([202, 999]) == 1
        assert c.batch_exist([202]) == [False]
    finally:
        node.stop()


def _seq(tokens):
    req = Request(
        "r", list(tokens), SamplingParams(max_tokens=4), max_model_len=256
    )
    return req.sequences[0]


def test_three_tier_offload_and_store_fetch():
    """Host-tier displacement pushes to the store; a host miss falls
    through to a store get and restores the block."""
    node = StoreNode()
    try:
        host_k = np.zeros((1, 8), np.float32)  # ONE host slot forces push
        host_v = np.zeros((1, 8), np.float32)
        device = {}  # dev_block -> (k, v) contents (fake HBM)

        def swap_out(dev, host):
            host_k[host], host_v[host] = device[dev]

        restored = []

        def swap_in(host, dev):
            restored.append((host_k[host].copy(), host_v[host].copy(), dev))

        ctrl = GlobalKVController(
            HostKVPool(1),
            swap_out,
            swap_in,
            store=KVStoreClient(node.url),
            read_host=lambda i: (host_k[i], host_v[i]),
            write_host=lambda i, k, v: (
                host_k.__setitem__(i, k), host_v.__setitem__(i, v)
            ),
        )
        device[7] = (np.full(8, 1.0, np.float32), np.full(8, 2.0, np.float32))
        device[8] = (np.full(8, 3.0, np.float32), np.full(8, 4.0, np.float32))
        ctrl.on_device_evict(7, 111)  # host now holds 111
        ctrl.on_device_evict(8, 222)  # 111 pushed to store, host holds 222
        assert ctrl.store_puts == 1
        assert ctrl.pool.lookup(111) is None

        # miss on host -> store fetch; displaces 222 (pushed upstream too)
        assert ctrl.try_fetch(111, device_block_id=5)
        assert ctrl.store_fetches == 1
        k, v, dev = restored[-1]
        np.testing.assert_array_equal(k, np.full(8, 1.0))
        np.testing.assert_array_equal(v, np.full(8, 2.0))
        assert dev == 5
        # both blocks now live in the store
        assert ctrl.store.batch_exist([111, 222]) == [True, True]
        # unknown hash: clean miss
        assert not ctrl.try_fetch(999, device_block_id=6)
    finally:
        node.stop()


def test_cross_engine_prefix_reuse_via_store():
    """Engine A's computed prefix reaches engine B through the store:
    same greedy output, with B recording store fetches."""
    from tests.test_engine import tiny_config
    from xllm_tpu.engine import LLMEngine

    node = StoreNode(max_blocks=256)
    try:
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        prompt = list(range(1, 30))

        cfg_a = tiny_config(num_host_blocks=1, kv_store_url=node.url)
        cfg_a.cache.num_blocks = 16
        eng_a = LLMEngine(cfg_a)
        eng_a.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
        out_a = eng_a.generate_all()[0].outputs[0].token_ids

        # churn A so the prefix blocks cascade device -> host -> store
        rng = np.random.default_rng(1)
        for _ in range(3):
            eng_a.add_request(
                prompt_token_ids=[int(x) for x in rng.integers(30, 90, 40)],
                sampling_params=sp,
            )
            eng_a.generate_all()
        assert eng_a.block_manager.hierarchy.store_puts > 0

        cfg_b = tiny_config(num_host_blocks=4, kv_store_url=node.url)
        cfg_b.cache.num_blocks = 16
        eng_b = LLMEngine(cfg_b)
        eng_b.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
        out_b = eng_b.generate_all()[0].outputs[0].token_ids
        assert out_b == out_a
        assert eng_b.block_manager.hierarchy.store_fetches > 0
        assert eng_b.block_manager.num_used_blocks == 0
    finally:
        node.stop()
