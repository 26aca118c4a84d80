"""LLMEngine: scheduler + block manager + model runner glue.

Counterpart of the reference's LLMEngine + master step loop
(reference xllm/core/distributed_runtime/llm_engine.cpp:913-977 `step`,
llm_master.cpp:254-269 loop). The TPU collapse (SURVEY.md §7.1): no worker
RPC fan-out — one process drives jit calls on the mesh; "engine step" =
schedule -> prefill calls + decode call -> lagged postprocess.

Async schedule overlap (reference async_schedule, continuous_scheduler.cpp
:1293 + fake-token fixup llm_engine.cpp:979): sampled tokens stay on device
in the runner's last_tokens ring and feed the next step's embedding lookup
directly; the host appends PLACEHOLDER tokens at dispatch and fixes them up
``overlap_depth`` steps later when the async device->host copy has landed.
This hides the device->host fetch latency entirely (the fetch round-trip
can exceed the whole decode step time).
"""

from __future__ import annotations

import os
import time
import uuid
from collections import deque
from dataclasses import dataclass

import numpy as np

import jax

from xllm_tpu.config import EngineConfig
from xllm_tpu.framework.block_manager import BlockManager
from xllm_tpu.framework.request import (
    FinishReason,
    Request,
    RequestOutput,
    Sequence,
    SequenceOutput,
)
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.framework.tokenizer import IncrementalDecoder, Tokenizer
from xllm_tpu.runtime.model_runner import ModelRunner
from xllm_tpu.scheduler.continuous import ContinuousScheduler
from xllm_tpu.utils import get_logger

logger = get_logger(__name__)


@dataclass
class _Pending:
    """One dispatched step whose sampled tokens are still on device."""

    seqs: list[Sequence]
    tokens: jax.Array  # int32 device
    logprobs: jax.Array  # f32 device
    rows: list[int] | None = None  # seqs[j] <- tokens[rows[j]] (None = 1:1)
    top_ids: jax.Array | None = None  # [N, K] alternatives (top_logprobs)
    top_lps: jax.Array | None = None


class LLMEngine:
    def __init__(
        self,
        config: EngineConfig,
        tokenizer: Tokenizer | None = None,
        runner: ModelRunner | None = None,
    ) -> None:
        self.config = config
        self.tokenizer = tokenizer
        if tokenizer is None and config.model.model_path:
            try:
                self.tokenizer = Tokenizer.from_path(config.model.model_path)
            except Exception as e:  # tokenizer-less (token id I/O only) is fine
                logger.warning("no tokenizer loaded: %s", e)

        self.runner = runner or ModelRunner(config)
        if self.runner.params is None:
            self.runner.load_model()
        if self.runner.k_cache is None:
            self.runner.initialize_kv_cache()
        if getattr(self.runner.model, "is_hybrid", False):
            # linear-attention state cannot rewind (spec rejection), fork
            # (beam), be rebuilt from shared pages (prefix cache), or split
            # its token scan across cp ranks — reference restricts the same
            # paths for qwen3-next-class hybrids
            if config.speculative.method:
                raise NotImplementedError(
                    "speculative decoding is unsupported for hybrid "
                    "linear-attention models"
                )
            if config.parallel.cp_size > 1:
                raise NotImplementedError(
                    "context parallelism is unsupported for hybrid models"
                )
            config.cache.enable_prefix_cache = False
        self.block_manager = self._make_block_manager()
        # boundary gate for per-fixup prefix-cache registration (0 = off)
        self._cache_gate_bs = (
            config.cache.block_size
            if config.cache.enable_prefix_cache else 0
        )
        # step-time models feed latency-aware budgeting (reference
        # ProfileManager, scheduler/profile/profile_manager.h:33-145);
        # observed from engine step wall time — under schedule overlap the
        # loop blocks on the fixup fetch, so steady-state wall time tracks
        # device step time
        self.profile_manager = None
        sc = config.scheduler
        if sc.policy == "mix" or sc.ttft_budget_ms > 0:
            from xllm_tpu.scheduler.profile import ProfileManager

            self.profile_manager = ProfileManager()
        if sc.policy == "mix":
            from xllm_tpu.scheduler.mix import MixScheduler

            self.scheduler = MixScheduler(
                sc, self.block_manager, self.profile_manager
            )
        else:
            self.scheduler = ContinuousScheduler(
                sc, self.block_manager, self.profile_manager
            )
        # forward interruption (reference InterruptionBus,
        # interruption_bus.h:22; consumed at the step boundary — the TPU
        # analog of aborting the forward, see common/interruption.py)
        from xllm_tpu.common.interruption import InterruptionBus

        self.interruption_bus = InterruptionBus()
        self._decoders: dict[int, IncrementalDecoder] = {}
        # inline detokenization in the step loop. The async serving front
        # sets this False and detokenizes on its response thread instead
        # (reference AsyncResponseProcessor, async_response_processor.h:29)
        # — EXCEPT sequences with stop strings, whose stopping decision
        # needs text at the step boundary (kept inline regardless).
        self.inline_detok = True
        self._active_requests: dict[str, Request] = {}
        self._image_processor = None
        self._video_processor = None
        self._encoder_cache = None
        # async schedule-overlap state
        self._pending: deque[_Pending] = deque()
        self.overlap_depth = (
            config.scheduler.overlap_depth
            if config.scheduler.enable_schedule_overlap
            else 0
        )
        self.overlap_depth_prefill = min(
            config.scheduler.overlap_depth_prefill, self.overlap_depth
        )
        self._step_no = 0
        self._last_prefill_step = -(1 << 30)
        self._free_slots = list(range(self.runner.max_slots - 1, -1, -1))
        # speculative decoding (reference SpeculativeEngine selection,
        # llm_master.cpp:47-51): suffix/ngram drafting is model-free
        self.spec_k = 0
        self.spec_model_based = False
        if config.speculative.method in ("suffix", "ngram"):
            self.spec_k = max(config.speculative.num_speculative_tokens, 1)
            # spec verification is synchronous — multi-token yield replaces
            # the overlap as the fetch-latency amortizer
            self.overlap_depth = 0
        elif config.speculative.method in ("mtp", "eagle3"):
            # draft-head speculative decoding (reference MTP/Eagle3 workers,
            # mtp_worker_impl.h:34): drafts are generated on device inside
            # the verify dispatch
            self.spec_k = max(config.speculative.num_speculative_tokens, 1)
            self.spec_model_based = True
            self.overlap_depth = 0
        self._proposers: dict[int, object] = {}
        # spec diagnostics: [drafted seq-steps, plain seq-steps,
        # accepted draft tokens] (surfaced by bench.py)
        self.spec_stats = [0, 0, 0]
        # cross-request suffix cache over finished generations (reference
        # global SuffixDecodingCache tree, suffix_tree.h:129,144)
        self._global_suffix = None
        if config.speculative.method in ("suffix", "ngram"):
            from xllm_tpu.framework.suffix_cache import GlobalSuffixCache

            self._global_suffix = GlobalSuffixCache()
        from xllm_tpu.framework.beam import BeamRunner

        self._beam = BeamRunner(self)
        # EPLB: engine-driven load window + rebalance trigger (reference
        # EplbManager hooks, llm_engine.cpp:942-945)
        self._eplb = None
        self._eplb_steps = 0
        if self.runner.collect_expert_loads:
            from xllm_tpu.framework.eplb import EplbManager

            m = config.model
            # the engine fetches device loads every
            # eplb.rebalance_interval steps; each fetch is one full manager
            # window (rebalance_interval=1 record)
            self._eplb = EplbManager(
                num_layers=m.num_hidden_layers,
                num_experts=m.num_experts,
                num_devices=max(config.parallel.tp_size, 1),
                rebalance_interval=1,
                threshold=config.eplb.imbalance_threshold,
                num_slots=m.num_experts + config.eplb.redundant_experts,
            )

    def _make_block_manager(self):
        config = self.config
        hierarchy = None
        if config.cache.num_host_blocks > 0:
            from xllm_tpu.framework.host_kv import (
                HierarchyController,
                HostKVPool,
            )

            self.runner.init_host_kv(config.cache.num_host_blocks)
            if config.cache.kv_store_url:
                # third tier: cross-instance store (Mooncake-store analog,
                # reference kv_cache_store.h:26)
                from xllm_tpu.disagg.kv_store import (
                    GlobalKVController,
                    KVStoreClient,
                )

                runner = self.runner
                hierarchy = GlobalKVController(
                    HostKVPool(config.cache.num_host_blocks),
                    swap_out=runner.swap_out_block,
                    swap_in=runner.swap_in_block,
                    store=KVStoreClient(config.cache.kv_store_url),
                    read_host=lambda i: (runner.host_k[i], runner.host_v[i]),
                    write_host=runner.write_host_block,
                )
            else:
                hierarchy = HierarchyController(
                    HostKVPool(config.cache.num_host_blocks),
                    swap_out=self.runner.swap_out_block,
                    swap_in=self.runner.swap_in_block,
                )
        backend = config.cache.block_backend
        if backend == "auto":
            from xllm_tpu import native

            backend = "native" if native.available() else "python"
        if backend == "native":
            from xllm_tpu.framework.native_block_manager import (
                NativeBlockManager,
            )

            cls = NativeBlockManager
        else:
            cls = BlockManager
        dp = config.parallel.dp_size
        if dp > 1:
            # per-DP-rank pools over the data-sharded block dim (reference
            # BlockManagerPool, block_manager_pool.h:27); the host tier is
            # shared below them (hierarchy_block_manager_pool.h:40,74)
            from xllm_tpu.framework.block_manager import BlockManagerPool

            return BlockManagerPool(
                num_blocks=self.runner.num_blocks,
                block_size=config.cache.block_size,
                dp_size=dp,
                enable_prefix_cache=config.cache.enable_prefix_cache,
                manager_cls=cls,
                hierarchy=hierarchy,
            )
        return cls(
            num_blocks=self.runner.num_blocks,
            block_size=config.cache.block_size,
            enable_prefix_cache=config.cache.enable_prefix_cache,
            hierarchy=hierarchy,
        )

    # ------------------------------------------------------------------
    # request intake (reference llm_master.cpp:177 handle_request)
    # ------------------------------------------------------------------
    def add_request(
        self,
        prompt: str | None = None,
        prompt_token_ids: list[int] | None = None,
        sampling_params: SamplingParams | None = None,
        request_id: str | None = None,
        embed: bool = False,
        priority: int = 0,
        offline: bool = False,
        images: list | None = None,
        videos: list | None = None,
    ) -> Request:
        if prompt_token_ids is None:
            if prompt is None or self.tokenizer is None:
                raise ValueError("need prompt_token_ids or (prompt + tokenizer)")
            prompt_token_ids = self.tokenizer.encode(prompt)
        if not prompt_token_ids:
            raise ValueError("prompt must contain at least one token")
        mm_state = None
        if images or videos:
            if not getattr(self.runner.model, "is_vlm", False):
                raise ValueError("this model does not accept images")
            prompt_token_ids, mm_state = self._process_images(
                prompt_token_ids, images, videos
            )
        max_len = self.config.scheduler.max_model_len
        if len(prompt_token_ids) + 1 > max_len:
            # reference rejects over-context prompts at intake
            # (xllm/core/scheduler/continuous_scheduler.cpp:390 length check)
            raise ValueError(
                f"prompt length {len(prompt_token_ids)} exceeds max_model_len "
                f"{max_len} (need room for at least one generated token)"
            )
        sampling_params = sampling_params or SamplingParams()
        if sampling_params.use_beam_search and (
            sampling_params.repetition_penalty != 1.0
            or sampling_params.frequency_penalty != 0.0
            or sampling_params.presence_penalty != 0.0
        ):
            raise ValueError("beam search with penalties is not supported")
        if sampling_params.use_beam_search and getattr(
            self.runner.model, "is_hybrid", False
        ):
            raise ValueError(
                "beam search is unsupported for hybrid linear-attention "
                "models (state cannot fork)"
            )
        if sampling_params.use_beam_search:
            cap = min(
                self.config.scheduler.max_seqs_per_batch,
                max(self.config.scheduler.decode_batch_buckets),
            )
            if (sampling_params.best_of or sampling_params.n) > cap:
                # run_beam_decode dispatches all beams in one decode
                # batch; beyond the largest bucket row assignment fails
                raise ValueError(
                    f"best_of={sampling_params.best_of} exceeds the "
                    f"largest decode batch this engine compiles ({cap})"
                )
        if embed:
            sampling_params = SamplingParams(max_tokens=1)
        request_id = request_id or f"req-{uuid.uuid4().hex[:16]}"
        req = Request(
            request_id=request_id,
            prompt_token_ids=prompt_token_ids,
            sampling_params=sampling_params,
            eos_token_ids=tuple(self.config.model.eos_token_ids),
            max_model_len=self.config.scheduler.max_model_len,
            prompt=prompt or "",
            embed=embed,
            priority=priority,
            offline=offline,
        )
        if mm_state is not None:
            embeds, positions, mrope, offset, deepstack = mm_state
            for seq in req.sequences:
                seq.mm_embeds = embeds
                seq.mm_positions = positions
                seq.mrope_positions = mrope
                seq.rope_offset = offset
                seq.mm_deepstack = deepstack
        if sampling_params.use_beam_search:
            # beam requests: only sequences[0] prefills; the rest are a
            # fork pool driven by the BeamRunner (beam_searcher.cpp:21)
            for seq in req.sequences:
                seq.beam_request = True
            for seq in req.sequences[1:]:
                seq.on_hold = True
        self.scheduler.add_request(req)
        self._active_requests[request_id] = req
        if self.tokenizer is not None:
            for seq in req.sequences:
                self._decoders[seq.seq_id] = IncrementalDecoder(
                    self.tokenizer, seq.num_prompt_tokens
                )
        return req

    def sample_slots(
        self,
        prompt_token_ids: list[int],
        slot_positions: list[int],
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = -1,
        num_top: int = 0,
    ) -> list[dict]:
        """Multi-position sampling (reference /v1/sample,
        sample_service_impl.cpp:130): sample the model's next-token
        distribution at each slot position in ONE prompt forward — slot
        at position p draws from the logits after prefix[:p] (the
        reference's token_position-1 source, sample_slot.cpp:49-52).

        Synchronous; runs between engine steps (route through the async
        engine's call op under a live server). Returns one dict per slot:
        {token_id, logprob, top_ids, top_logprobs}.
        """
        n = len(prompt_token_ids)
        if not slot_positions:
            return []
        if any(p < 1 or p >= n for p in slot_positions):
            # p=0 has no preceding prefix to condition on (the reference
            # samples from logits at token_position-1, sample_slot.cpp:49)
            raise ValueError("slot position out of range (must be in [1, n))")
        max_chunk = max(self.config.scheduler.prefill_token_buckets)
        if n > max_chunk:
            raise ValueError(
                f"prompt length {n} exceeds the single-dispatch sample "
                f"limit {max_chunk}"
            )
        from xllm_tpu.framework.request import StoppingChecker

        seq = Sequence(
            prompt_token_ids=list(prompt_token_ids),
            sampling_params=SamplingParams(max_tokens=1, ignore_eos=True),
            stopping=StoppingChecker(
                max_new_tokens=1,
                max_model_len=self.config.scheduler.max_model_len,
                ignore_eos=True,
            ),
        )
        seq.slot_id = self.runner.trash_slot
        if not self.block_manager.allocate(seq, n):
            raise RuntimeError("KV pool exhausted for sample request")
        try:
            rows = np.asarray([p - 1 for p in slot_positions], np.int32)
            tokens, lps, top_ids, top_lps = self.runner.run_sample_slots(
                seq, rows, temperature, top_k, top_p, seed, num_top
            )
            # the forward wrote every prompt token's KV — mark computed so
            # freeing can legitimately donate the blocks to the prefix cache
            seq.num_computed_tokens = n
        finally:
            self.block_manager.free(seq)
        out = []
        for j in range(len(slot_positions)):
            item = {
                "token_id": int(tokens[j]),
                "logprob": float(lps[j]),
            }
            if top_ids is not None:
                item["top_ids"] = [int(t) for t in top_ids[j]]
                item["top_logprobs"] = [float(x) for x in top_lps[j]]
            out.append(item)
        return out

    def _process_images(self, prompt_token_ids, images, videos=None):
        """Vision intake (reference VLM master prompt processing +
        encoder path, vlm_master.h:44 + video processors,
        qwen2_vl_video_processor.h:30): preprocess each image/video,
        encode through the tower (with the content-hash EncoderCache),
        expand the placeholder tokens, compute M-RoPE positions.

        Placeholders are matched in prompt order: each image token
        consumes the next image, each video token the next video. A
        video may be an ``[T, H, W, 3]`` array or a ``(frames, fps)``
        pair (fps drives frame sampling + qwen2.5-vl temporal rope)."""
        import numpy as np

        from xllm_tpu.processors.image import ImageProcessor
        from xllm_tpu.processors.video import VideoProcessor

        images = list(images or [])
        videos = list(videos or [])
        model = self.runner.model
        if self._image_processor is None:
            vc = model.vision_cfg
            # checkpoint preprocessing config (reference image processors
            # read the HF preprocessor_config.json the same way)
            pp: dict = {}
            mp = self.config.model.model_path
            if mp:
                import json
                import os

                for fname in ("preprocessor_config.json",
                              "video_preprocessor_config.json"):
                    fpath = os.path.join(mp, fname)
                    if os.path.exists(fpath):
                        with open(fpath) as f:
                            pp = {**json.load(f), **pp}
            kw = dict(
                patch_size=vc.patch_size,
                merge_size=vc.spatial_merge_size,
                temporal_patch_size=vc.temporal_patch_size,
                image_mean=pp.get("image_mean"),
                image_std=pp.get("image_std"),
            )
            if pp.get("min_pixels"):
                kw["min_pixels"] = pp["min_pixels"]
            if pp.get("max_pixels"):
                kw["max_pixels"] = pp["max_pixels"]
            self._image_processor = ImageProcessor(**kw)
            self._video_processor = VideoProcessor(**kw)
            from xllm_tpu.framework.encoder_cache import EncoderCache

            self._encoder_cache = EncoderCache()
        img_proc = self._image_processor
        vid_proc = self._video_processor
        img_tok = model.image_token_id
        vid_tok = getattr(model, "video_token_id", -1)
        if img_tok < 0:
            raise ValueError("model config lacks image_token_id")
        n_img_ph = sum(1 for t in prompt_token_ids if t == img_tok)
        n_vid_ph = sum(1 for t in prompt_token_ids if t == vid_tok)
        if n_img_ph != len(images):
            raise ValueError(
                f"{len(images)} images but {n_img_ph} image tokens"
            )
        if n_vid_ph != len(videos):
            raise ValueError(
                f"{len(videos)} videos but {n_vid_ph} video tokens"
            )

        def encode_media(patches, grid, proc):
            key = proc.content_hash(patches)
            emb = self._encoder_cache.get(key)
            if emb is None:
                emb = self.runner.encode_image(patches, grid)
                self._encoder_cache.put(key, emb)
            if isinstance(emb, tuple):
                return emb  # (embeds, deepstack)
            return emb, None

        # media in PROMPT order (grids/embeds interleave images + videos)
        grids, all_embeds, all_ds, spans, spgs = [], [], [], [], []
        img_i = vid_i = 0
        for t in prompt_token_ids:
            if t == img_tok:
                patches, grid = img_proc(np.asarray(images[img_i]))
                emb, ds = encode_media(patches, grid, img_proc)
                all_embeds.append(emb)
                all_ds.append(ds)
                grids.append(grid)
                spans.append((img_tok, img_proc.num_llm_tokens(grid)))
                spgs.append(0.0)
                img_i += 1
            elif t == vid_tok:
                v = videos[vid_i]
                frames, fps = (v if isinstance(v, tuple) else (v, 0.0))
                patches, grid, spg = vid_proc(np.asarray(frames), fps)
                emb, ds = encode_media(patches, grid, vid_proc)
                all_embeds.append(emb)
                all_ds.append(ds)
                spans.append((vid_tok, vid_proc.num_llm_tokens(grid)))
                if getattr(model, "video_grid_per_frame", False):
                    # qwen3-vl: each temporal group is its own t=1 rope
                    # grid (HF get_rope_index repeat_interleaves video
                    # grids; the reference processor adds timestamp TEXT
                    # tokens between frames — temporal info rides the
                    # prompt)
                    gt, gh, gw = grid
                    grids.extend([(1, gh, gw)] * gt)
                    spgs.extend([spg] * gt)
                else:
                    grids.append(grid)
                    spgs.append(spg)
                vid_i += 1
        # expand each placeholder to its media's LLM-token count
        out_tokens: list[int] = []
        mm_positions: list[int] = []
        m_i = 0
        for t in prompt_token_ids:
            if t == img_tok or t == vid_tok:
                tok, n = spans[m_i]
                mm_positions.extend(
                    range(len(out_tokens), len(out_tokens) + n)
                )
                out_tokens.extend([tok] * n)
                m_i += 1
            else:
                out_tokens.append(t)
        from xllm_tpu.models.qwen2_vl import get_rope_index

        mrope, offset = get_rope_index(
            out_tokens, img_tok, grids,
            merge_size=model.vision_cfg.spatial_merge_size,
            video_token_id=vid_tok if vid_tok >= 0 else -9,
            second_per_grid_ts=spgs,
            tokens_per_second=getattr(
                model, "vision_tokens_per_second", 0.0
            ),
        )
        embeds = np.concatenate(all_embeds, axis=0)
        deepstack = None
        if any(d is not None for d in all_ds):
            deepstack = np.concatenate(
                [d for d in all_ds if d is not None], axis=1
            )  # [K, n_mm, D]
        return out_tokens, (
            embeds, np.asarray(mm_positions, np.int64), mrope, offset,
            deepstack,
        )

    def score_prompt(self, prompt_token_ids: list[int]) -> "np.ndarray":
        """Per-token logprobs of a prompt under the model (scoring /
        perplexity; the OpenAI echo+logprobs semantics). Returns lp
        [n-1] f32 where lp[i] = log p(token[i+1] | tokens[:i+1]).

        Offline synchronous utility: allocates a throwaway sequence on
        the block pool, scores chunk by chunk, frees the blocks
        (reference accuracy-harness flow, docs/en/accuracy_test.md)."""
        import numpy as np

        from xllm_tpu.framework.request import StoppingChecker
        from xllm_tpu.framework.sampling_params import SamplingParams

        n = len(prompt_token_ids)
        if n < 2:
            raise ValueError("scoring needs at least 2 tokens")
        if n > self.config.scheduler.max_model_len:
            raise ValueError("prompt exceeds max_model_len")
        sp = SamplingParams(max_tokens=1)
        seq = Sequence(
            list(prompt_token_ids), sp,
            StoppingChecker(
                max_new_tokens=1,
                max_model_len=self.config.scheduler.max_model_len,
            ),
            request_id="score",
        )
        chunk = self.config.scheduler.max_tokens_per_chunk_for_prefill
        bs = self.config.cache.block_size
        chunk = max(bs, chunk - chunk % bs)
        lps: list[np.ndarray] = []
        try:
            while seq.num_computed_tokens < n:
                m = min(chunk, n - seq.num_computed_tokens)
                if not self.block_manager.allocate(seq, m):
                    raise RuntimeError("KV pool exhausted during scoring")
                lps.append(self.runner.run_score_chunk(seq, m))
                seq.num_computed_tokens += m
        finally:
            self.block_manager.free(seq)
        return np.concatenate(lps)[: n - 1]

    def abort_request(self, request_id: str) -> None:
        req = self._active_requests.pop(request_id, None)
        if req is not None:
            self.scheduler.abort_request(req)
            self._beam.drop(request_id)
            for seq in req.sequences:
                self._release_slot(seq)
                # normal cleanup happens in _build_outputs on finish —
                # aborted requests never get there (unbounded leak of
                # decoders + suffix indexes otherwise)
                self._decoders.pop(seq.seq_id, None)
                self._proposers.pop(seq.seq_id, None)

    def has_unfinished(self) -> bool:
        return self.scheduler.has_unfinished() or bool(self._pending)

    # ------------------------------------------------------------------
    # slot pool for the device last_tokens ring
    # ------------------------------------------------------------------
    def _assign_slot(self, seq: Sequence) -> None:
        if seq.slot_id < 0:
            if not self._free_slots:
                # the ring is sized max_seqs + 2*overlap_depth; running
                # out means a fixup-lag pile-up — fail with a clear
                # message instead of an IndexError mid-step
                raise RuntimeError(
                    "last_tokens ring exhausted (finished sequences "
                    "holding slots through the fixup lag); raise "
                    "max_seqs_per_batch headroom"
                )
            seq.slot_id = self._free_slots.pop()

    def _release_slot(self, seq: Sequence) -> None:
        if seq.slot_id >= 0:
            self._free_slots.append(seq.slot_id)
            seq.slot_id = -1

    # ------------------------------------------------------------------
    # the engine step (reference continuous_scheduler.cpp:1242 + llm_engine.cpp:913)
    # ------------------------------------------------------------------
    def step(self) -> list[RequestOutput]:
        t_step0 = time.perf_counter() if self.profile_manager else 0.0
        if (
            self.config.scheduler.enable_forward_interruption
            and self.interruption_bus.consume()
        ):
            for req in self.scheduler.handle_prefill_interruption():
                for seq in req.sequences:
                    self._release_slot(seq)
        out = self.scheduler.schedule()
        for req in out.preempted_requests:
            for seq in req.sequences:
                self._release_slot(seq)

        embed_done: list[Sequence] = []
        batched_items: list[tuple[Sequence, int]] = []
        for seq, n in out.prefill_items:
            self._assign_slot(seq)
            req = self._active_requests.get(seq.request_id)
            if (
                req is not None
                and req.embed
                and seq.num_computed_tokens + n >= seq.num_tokens
            ):
                vec = self.runner.run_prefill_embed(seq, n)
                seq.num_computed_tokens += n
                seq.embedding = vec.tolist()
                seq.finish(FinishReason.STOP)
                embed_done.append(seq)
                continue
            if self.runner.supports_batched_prefill:
                batched_items.append((seq, n))
                continue
            tokens, logprobs, samples_token = self.runner.run_prefill(seq, n)
            seq.num_computed_tokens += n
            if self._cache_gate_bs:
                # register full prompt blocks now — the gated fixup path
                # would only catch them at the next block boundary
                self.block_manager.cache_computed_blocks(seq)
            if samples_token:
                seq.append_placeholder()
                tokens.copy_to_host_async()
                logprobs.copy_to_host_async()
                self._pending.append(_Pending([seq], tokens, logprobs))

        # whole-batch prefill: one dispatch per (P, S) bucket group
        # (reference BatchInputBuilder + llm_engine step fan-out,
        # batch_input_builder.h:53, llm_engine.cpp:923)
        if batched_items:
            from xllm_tpu.runtime.input_builder import group_prefill_items

            sc = self.config.scheduler
            for group in group_prefill_items(
                batched_items,
                sc.prefill_token_buckets,
                sc.prefill_row_buckets,
                sc.max_tokens_per_batch,
            ):
                tokens, logprobs, flags, rows, tops = (
                    self.runner.run_prefill_batched(group)
                )
                sampling_seqs, sample_rows = [], []
                for i, (seq, n) in enumerate(group):
                    seq.num_computed_tokens += n
                    if self._cache_gate_bs:
                        self.block_manager.cache_computed_blocks(seq)
                    if flags[i]:
                        seq.append_placeholder()
                        sampling_seqs.append(seq)
                        sample_rows.append(rows[i])
                if sampling_seqs:
                    tokens.copy_to_host_async()
                    logprobs.copy_to_host_async()
                    self._pending.append(
                        _Pending(sampling_seqs, tokens, logprobs, sample_rows,
                                 tops[0], tops[1])
                    )

        decode_seqs = out.decode_seqs
        verified: list[Sequence] = []
        if self.spec_model_based and decode_seqs:
            decode_seqs = []
            mtp_seqs: list[Sequence] = []
            for seq in out.decode_seqs:
                self._assign_slot(seq)
                if self._spec_capacity(seq):
                    mtp_seqs.append(seq)
                    self.spec_stats[0] += 1
                else:
                    decode_seqs.append(seq)
                    self.spec_stats[1] += 1
            max_rows = self.config.scheduler.prefill_row_buckets[-1]
            for lo in range(0, len(mtp_seqs), max_rows):
                # bound each dispatch to the largest verify-row bucket
                # (next_bucket silently clamps; overflow would corrupt
                # row assignment)
                grp = mtp_seqs[lo : lo + max_rows]
                all_tokens, num_acc, vrows = self.runner.run_verify_mtp(
                    grp, self.spec_k
                )
                for seq, i in zip(grp, vrows):
                    self._apply_verified(seq, all_tokens[i, : num_acc[i]])
                    verified.append(seq)
        elif self.spec_k and decode_seqs:
            decode_seqs = []
            pairs: list[tuple[Sequence, list[int]]] = []
            for seq in out.decode_seqs:
                self._assign_slot(seq)
                draft = self._propose_draft(seq)
                self.spec_stats[0 if draft else 1] += 1
                if draft is None:
                    decode_seqs.append(seq)
                elif self.runner.supports_batched_prefill:
                    pairs.append((seq, draft))
                else:
                    tokens, n = self.runner.run_verify(seq, draft)
                    self._apply_verified(seq, tokens)
                    verified.append(seq)
            max_rows = self.config.scheduler.prefill_row_buckets[-1]
            for lo in range(0, len(pairs), max_rows):
                # ONE dispatch verifies a bucketful of drafted sequences
                # (reference packs all drafts into one target forward,
                # spec_input_builder.cpp + speculative_engine.cpp:51-57);
                # bounded by the largest verify-row bucket — next_bucket
                # clamps silently and overflow would corrupt rows
                grp = pairs[lo : lo + max_rows]
                all_tokens, num_acc, vrows = self.runner.run_verify_batched(
                    grp, self.spec_k
                )
                for (seq, _), i in zip(grp, vrows):
                    self._apply_verified(seq, all_tokens[i, : num_acc[i]])
                    verified.append(seq)

        if decode_seqs:
            window = self.config.model.sliding_window or 0
            for seq in decode_seqs:
                self._assign_slot(seq)
                if window > 0:
                    # sliding-window models: recycle pages that fell out of
                    # the attention window (reference SlidingWindowBlockManager)
                    self.block_manager.release_out_of_window(seq, window)
            tokens, logprobs, rows, tops = self.runner.run_decode(decode_seqs)
            for seq in decode_seqs:
                seq.num_computed_tokens += 1
                seq.append_placeholder()
            tokens.copy_to_host_async()
            logprobs.copy_to_host_async()
            self._pending.append(
                _Pending(list(decode_seqs), tokens, logprobs, rows,
                         tops[0], tops[1])
            )

        touched: list[Sequence] = list(verified) + embed_done
        self._step_no += 1
        if out.prefill_items:
            self._last_prefill_step = self._step_no
        depth = self.overlap_depth if not out.is_empty else 0
        if (
            depth > self.overlap_depth_prefill
            and self._step_no - self._last_prefill_step
            < self.overlap_depth
        ):
            # adaptive drain: while prefills are in flight, first tokens
            # are what matters — drain shallower (paying a bounded fetch
            # stall) so TTFT doesn't inherit the full decode-depth lag;
            # steady-state decode keeps the deep ring that clears the
            # ~27 ms fetch-RTT wall (PERF.md r4 second wall)
            depth = self.overlap_depth_prefill
        while len(self._pending) > depth:
            touched.extend(self._process_pending(self._pending.popleft()))

        # beam search: activate ready requests, advance active ones
        # (reference BeamSearcher forward, beam_searcher.cpp:21)
        for req in self.scheduler.running:
            seq0 = req.sequences[0]
            if (
                getattr(seq0, "beam_request", False)
                and req.request_id not in self._beam.states
                and not seq0.is_finished
                and seq0.num_generated_tokens >= 1
                and not seq0.has_unfixed_tokens
            ):
                self._beam.start(req)
        for req in self._beam.step_all():
            touched.extend(req.sequences)

        for req in self.scheduler.free_finished():
            for seq in req.sequences:
                self._release_slot(seq)
        # early-finished sequences of still-running requests (n>1 /
        # best_of) hold ring slots until the whole request drains — once
        # their fixups are in, release so admission can't underflow the
        # slot pool
        for req in self.scheduler.running:
            for seq in req.sequences:
                if (
                    seq.is_finished
                    and seq.slot_id >= 0
                    and not seq.has_unfixed_tokens
                ):
                    self._release_slot(seq)
        self._maybe_rebalance_experts()
        if self.profile_manager is not None and not out.is_empty:
            dt = time.perf_counter() - t_step0
            # attribute only unmixed steps so the two models stay clean
            # (reference profiles prefill and decode separately,
            # profile_manager.h:33-145)
            if out.prefill_items and not out.decode_seqs:
                self.profile_manager.observe_prefill(
                    sum(n for _, n in out.prefill_items), dt
                )
            elif out.decode_seqs and not out.prefill_items:
                self.profile_manager.observe_decode(len(out.decode_seqs), dt)
        return self._build_outputs(touched)

    def _maybe_rebalance_experts(self) -> None:
        """Close the EPLB loop: fetch live loads, re-place experts when the
        device imbalance crosses the threshold (reference
        llm_engine.cpp:942-945 + EplbExecutor shuffling)."""
        if self._eplb is None:
            return
        self._eplb_steps += 1
        if self._eplb_steps % self.config.eplb.rebalance_interval != 0:
            return
        phys = self.runner.fetch_expert_loads()
        if phys is None:
            return
        # counts are PHYSICAL slots; fold back to logical expert ids
        # (replica slots of one expert sum — scatter-add, not assignment)
        nl = phys.shape[0]
        logical = np.zeros((nl, self._eplb.num_experts), phys.dtype)
        for layer in range(nl):
            np.add.at(
                logical[layer], self._eplb.placement[layer], phys[layer]
            )
        self._eplb.record(logical)
        if self._eplb.should_rebalance():
            placement = self._eplb.compute_placement()
            self.runner.apply_expert_placement(placement)
            logger.info(
                "EPLB rebalance #%d applied", self._eplb.rebalances
            )

    # ------------------------------------------------------------------
    # speculative decoding helpers
    # ------------------------------------------------------------------
    def _spec_capacity(self, seq: Sequence) -> bool:
        """Length bounds + k+1 block capacity for one speculative step."""
        k = self.spec_k
        sp = seq.sampling_params
        if (
            sp.repetition_penalty != 1.0
            or sp.frequency_penalty != 0.0
            or sp.presence_penalty != 0.0
        ):
            # rejection sampling bypasses the penalty pass; keep penalized
            # sequences on the exact decode path (same rule as
            # _propose_draft for the host proposers)
            return False
        if getattr(seq, "rope_offset", 0) != 0:
            # VLM rows: the verify builder positions are token indices,
            # not M-RoPE continuations — exact decode handles the offset
            return False
        if seq.num_fixed_tokens != seq.num_tokens:
            return False
        if seq.num_tokens + k + 1 > self.config.scheduler.max_model_len:
            return False
        if seq.num_generated_tokens + k + 1 > seq.stopping.max_new_tokens:
            return False
        return self.block_manager.allocate(seq, k + 1)

    def _propose_draft(self, seq: Sequence) -> list[int] | None:
        """Exactly spec_k draft tokens from the suffix proposer, or None."""
        from xllm_tpu.framework.suffix_cache import SuffixProposer

        k = self.spec_k
        sp = seq.sampling_params
        if (
            sp.repetition_penalty != 1.0
            or sp.frequency_penalty != 0.0
            or sp.presence_penalty != 0.0
        ):
            # rejection sampling bypasses the penalty pass; keep penalized
            # sequences on the exact decode path
            return None
        if getattr(seq, "rope_offset", 0) != 0:
            # VLM rows: verify positions are token indices, not M-RoPE
            # continuations — exact decode handles the offset
            return None
        if seq.num_fixed_tokens != seq.num_tokens:
            return None  # last token still on device (shouldn't happen sync)
        # the verify chunk writes spec_k KV positions whatever the draft
        # length (static shape), so near max_model_len the slots would
        # overflow the block-table width — those sequences (about to
        # finish) take exact decode
        if seq.num_tokens + k + 1 > self.config.scheduler.max_model_len:
            return None
        # near max_new_tokens, shrink the draft instead of leaving the
        # verify dispatch (a second plain-decode dispatch costs a second
        # sync fetch RTT per step); positions stay within the allocation
        k = min(k, seq.stopping.max_new_tokens - seq.num_generated_tokens - 1)
        if k < 0:
            return None
        # capacity for spec_k+1 tokens beyond computed (the verify chunk
        # writes K/V slots for every draft POSITION — static shape — even
        # when the draft is shorter or empty; an empty draft's row is
        # plain decode through the verify program, see the dispatch loop)
        if not self.block_manager.allocate(seq, self.spec_k + 1):
            return None
        prop = self._proposers.get(seq.seq_id)
        if prop is None:
            from xllm_tpu import native

            if native.available():  # C++ suffix index (reference-native twin)
                prop = native.NativeSuffixIndex()
            else:
                prop = SuffixProposer()
            self._proposers[seq.seq_id] = prop
        prop.extend(seq.token_ids, seq.num_fixed_tokens)
        draft = prop.propose(seq.token_ids, k)
        if not draft and self._global_suffix is not None:
            # per-sequence miss: try completed generations of earlier
            # requests (repeated prompts / shared boilerplate)
            draft = self._global_suffix.propose(seq.token_ids, k)
        if not draft:
            return []  # eligible, no match: rides the verify dispatch
            # with draft_len 0 (= exact decode) — a separate plain-decode
            # dispatch would cost a SECOND sync fetch RTT per step (the
            # r5 TPU spec probe measured ~60 ms steps = 2 x 27 ms RTTs)
        while len(draft) < k:  # pad short drafts by repeating the tail
            draft.append(draft[-1])
        return draft

    def _apply_verified(self, seq: Sequence, tokens) -> None:
        """Apply accepted tokens from a sync verify step."""
        # tokens = accepted drafts + 1 bonus/corrected token
        self.spec_stats[2] += max(len(tokens) - 1, 0)
        for tok in tokens:
            seq.append_token(int(tok), 0.0)
            seq.num_computed_tokens += 1
            if not seq.is_finished:
                seq.maybe_finish(
                    int(tok), self.config.scheduler.max_model_len
                )
            if seq.is_finished:
                break
        # keep the sample-then-compute invariant: last token's KV pending
        seq.num_computed_tokens = min(
            seq.num_computed_tokens, seq.num_tokens - 1
        )
        # detokenize even when the chunk finished the sequence — the
        # final accepted tokens' text must land in output_text (the
        # exact-decode fixup path decodes finishing tokens too)
        dec = self._decoders.get(seq.seq_id)
        if dec is not None and not (
            not self.inline_detok and not seq.stopping.stop_strings
        ):
            delta = dec.decode_new(seq.token_ids)
            if delta:
                seq.output_text += delta
                if seq.stopping.stop_strings:
                    cut = seq.stopping.check_stop_strings(seq.output_text)
                    if cut >= 0:
                        seq.output_text = seq.output_text[:cut]
                        seq.finish(FinishReason.STOP)
        if not seq.is_finished:
            self.block_manager.cache_computed_blocks(seq)

    def _process_pending(self, entry: _Pending) -> list[Sequence]:
        """Fix up placeholders with arrived device tokens; run stop logic."""
        tokens = np.asarray(entry.tokens)
        logprobs = np.asarray(entry.logprobs)
        top_ids = (
            np.asarray(entry.top_ids) if entry.top_ids is not None else None
        )
        top_lps = (
            np.asarray(entry.top_lps) if entry.top_lps is not None else None
        )
        rows = entry.rows if entry.rows is not None else range(len(entry.seqs))
        touched = []
        for seq, row in zip(entry.seqs, rows):
            if seq.is_finished and not seq.has_unfixed_tokens:
                continue  # overrun step of an already-stopped sequence
            if top_ids is not None and seq.sampling_params.logprobs:
                k = seq.sampling_params.logprobs
                seq.output_top_logprobs.append(
                    {
                        int(t): float(lp)
                        for t, lp in zip(top_ids[row][:k], top_lps[row][:k])
                    }
                )
            self._fixup_token(seq, int(tokens[row]), float(logprobs[row]))
            touched.append(seq)
        return touched

    def _fixup_token(self, seq: Sequence, token: int, logprob: float) -> None:
        seq.fixup_token(token, logprob)
        if getattr(seq, "beam_request", False):
            return  # the BeamRunner owns stopping + KV bookkeeping
        if not seq.is_finished:
            seq.maybe_finish(token, self.config.scheduler.max_model_len)
            # detokenize + stop-string scan (deferred to the response
            # thread under async serving unless stopping needs the text)
            dec = self._decoders.get(seq.seq_id)
            if dec is not None and not (
                not self.inline_detok and not seq.stopping.stop_strings
            ):
                delta = dec.decode_new(seq.token_ids[: seq.num_fixed_tokens])
                if delta:
                    seq.output_text += delta
                    if seq.stopping.stop_strings:
                        cut = seq.stopping.check_stop_strings(seq.output_text)
                        if cut >= 0:
                            seq.output_text = seq.output_text[:cut]
                            seq.finish(FinishReason.STOP)
        if seq.is_finished:
            seq.trim_unfixed()
        elif self._cache_gate_bs and (
            min(seq.num_computed_tokens, seq.num_fixed_tokens)
            % self._cache_gate_bs == 0
        ):
            # prefix-cache registration catches up from its chain cursor,
            # so calling only when a block boundary is crossed is exact —
            # and drops ~128 no-op calls/step from the decode host loop
            self.block_manager.cache_computed_blocks(seq)

    # ------------------------------------------------------------------
    def _build_outputs(self, touched: list[Sequence]) -> list[RequestOutput]:
        by_req: dict[str, list[Sequence]] = {}
        for seq in touched:
            by_req.setdefault(seq.request_id, []).append(seq)
        outputs = []
        for rid in by_req:
            req = self._active_requests.get(rid)
            if req is None:
                continue
            req_done = req.is_finished and not any(
                s.has_unfixed_tokens for s in req.sequences
            )
            ro = RequestOutput(
                request_id=rid,
                prompt=req.prompt,
                finished=req_done,
                outputs=[
                    SequenceOutput(
                        index=i,
                        text=seq.output_text,
                        token_ids=seq.token_ids[
                            seq.num_prompt_tokens : seq.num_fixed_tokens
                        ],
                        finish_reason=(
                            seq.finish_reason.value if seq.finish_reason else None
                        ),
                        logprobs=(
                            seq.output_logprobs
                            if seq.sampling_params.logprobs is not None
                            else None
                        ),
                        top_logprobs=(
                            seq.output_top_logprobs
                            if seq.sampling_params.logprobs
                            else None
                        ),
                    )
                    for i, seq in enumerate(req.sequences)
                ],
            )
            if req.embed and req.sequences[0].embedding is not None:
                ro.embedding = req.sequences[0].embedding
            if req_done:
                ro.usage = {
                    "prompt_tokens": req.sequences[0].num_prompt_tokens,
                    "completion_tokens": sum(
                        s.num_generated_tokens for s in req.sequences
                    ),
                }
                self._active_requests.pop(rid, None)
                for seq in req.sequences:
                    self._decoders.pop(seq.seq_id, None)
                    self._proposers.pop(seq.seq_id, None)
                    if self._global_suffix is not None and not req.aborted:
                        # finished generations feed the cross-request
                        # drafter (reference cache update on finish,
                        # suffix_worker_impl.h:30)
                        self._global_suffix.add(
                            seq.token_ids[: seq.num_fixed_tokens]
                        )
            outputs.append(ro)
        return outputs

    # ------------------------------------------------------------------
    # sleep / wakeup / weight update (RL; reference engine.h:137-156)
    # ------------------------------------------------------------------
    def sleep(self, level: int = 1) -> None:
        """Release HBM between rollouts. Requires a drained engine."""
        if self.has_unfinished():
            raise RuntimeError("cannot sleep with unfinished requests")
        self.runner.sleep(level)

    def wakeup(self) -> None:
        self.runner.wakeup()
        # KV content was dropped -> fresh block pool + prefix cache
        # (hybrid-model restrictions were enforced once in __init__; the
        # enable_prefix_cache=False override persists in the config)
        self.block_manager = self._make_block_manager()
        self.scheduler.block_manager = self.block_manager

    def update_weights(self, model_path: str | None = None) -> None:
        """Hot-swap weights; prefix cache is invalidated (stale KV)."""
        if self.has_unfinished():
            raise RuntimeError("cannot update weights with unfinished requests")
        self.runner.update_weights(model_path)
        if self._eplb is not None:
            # fresh stacks are in logical order: restart the EPLB window
            from xllm_tpu.framework.eplb import EplbManager

            self._eplb = EplbManager(
                num_layers=self._eplb.num_layers,
                num_experts=self._eplb.num_experts,
                num_devices=self._eplb.num_devices,
                rebalance_interval=self._eplb.rebalance_interval,
                threshold=self._eplb.threshold,
                num_slots=self._eplb.num_slots,
            )
        self.wakeup()

    def _export_weights(self) -> dict:
        """{dotted-path: host ndarray} for the P2P weight wire
        (reference linked-instance transfer, engine.h:137-156)."""
        return self.runner.export_weights()

    def _import_weights(self, flat: dict) -> None:
        """Install weights pushed by a trainer/peer (no disk)."""
        if self.has_unfinished():
            raise RuntimeError("cannot update weights with unfinished requests")
        self.runner.import_weights(flat)
        self.wakeup()

    # ------------------------------------------------------------------
    # offline blocking generation (reference llm_master.cpp:271 generate)
    # ------------------------------------------------------------------
    def generate_all(self, timeout_s: float = 3600.0) -> list[RequestOutput]:
        deadline = time.time() + timeout_s
        finals: dict[str, RequestOutput] = {}
        while self.has_unfinished():
            if time.time() > deadline:
                raise TimeoutError("generate_all timed out")
            for ro in self.step():
                if ro.finished:
                    finals[ro.request_id] = ro
        return list(finals.values())
