"""Beam search over the paged KV cache (engine-level).

Counterpart of the reference's BeamSearcher
(reference xllm/core/framework/sampling/beam_searcher.cpp:21 and its
device block-copy kernel; SequencesGroup beam expansion,
sequences_group.h:35). TPU design:

- one decode dispatch per beam step returns each beam's top-W expansion
  candidates (token id + logprob) — the host keeps the beam frontier;
- beams fork by sharing full KV blocks (ref counts) and copying only the
  partial tail block on device (`ModelRunner.copy_kv_blocks`), the exact
  scheme the reference implements with its block-copy kernel;
- a beam finishes on EOS (or max_tokens); search stops when ``width``
  hypotheses have finished or the length budget runs out, and the top-n
  land in the request's sequences.

Beam requests run synchronously outside the async token ring (scores must
be compared on host each step), like the reference's driver-side
beam_searcher_->forward (llm_worker_impl.cpp:324-341).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from xllm_tpu.framework.request import FinishReason, Request, Sequence


@dataclass
class _Beam:
    seq: Sequence
    cum_logprob: float = 0.0


@dataclass
class BeamState:
    request: Request
    width: int
    active: list[_Beam] = field(default_factory=list)
    finished: list[tuple[list[int], float]] = field(default_factory=list)
    # sequences of the request not currently holding an active beam
    pool: list[Sequence] = field(default_factory=list)

    @property
    def done(self) -> bool:
        return not self.active


def _length_norm(score: float, length: int, alpha: float = 0.0) -> float:
    if alpha <= 0 or length == 0:
        return score
    return score / (length**alpha)


class BeamRunner:
    """Drives one beam step for every active beam request."""

    def __init__(self, engine) -> None:
        self.engine = engine
        self.states: dict[str, BeamState] = {}

    def start(self, req: Request) -> None:
        """Activate beam search once the prompt KV is computed.

        The engine's normal prefill sampled a throwaway token; pop it and
        redo the last prompt position as a beam decode so the first
        expansion sees the full top-W distribution.
        """
        seq0 = req.sequences[0]
        # drop the prefill-sampled token (keep the prompt KV)
        seq0.token_ids.pop()
        seq0.num_fixed_tokens = len(seq0.token_ids)
        seq0.num_computed_tokens = seq0.num_tokens - 1
        seq0.on_hold = True
        state = BeamState(
            request=req,
            width=req.sampling_params.best_of,
            active=[_Beam(seq0, 0.0)],
            pool=list(req.sequences[1:]),
        )
        for s in state.pool:
            s.on_hold = True
        self.states[req.request_id] = state

    def drop(self, request_id: str) -> None:
        """Forget an externally aborted request (its blocks were already
        freed by the scheduler; the seqs must not be stepped again)."""
        self.states.pop(request_id, None)

    def step_all(self) -> list[Request]:
        """One beam step for every active request; returns completed."""
        done: list[Request] = []
        for rid, state in list(self.states.items()):
            if state.request.aborted:
                del self.states[rid]
                continue
            self._step(state)
            if state.done:
                self._finalize(state)
                done.append(state.request)
                del self.states[rid]
        return done

    # ------------------------------------------------------------------
    def _step(self, state: BeamState) -> None:
        eng = self.engine
        bm = eng.block_manager
        req = state.request
        sp = req.sampling_params
        max_new = sp.max_tokens
        eos = set(req.sequences[0].stopping.eos_token_ids or ())

        # capacity for one more token per beam; beams that can't get a
        # page finish as-is and return their seq to the fork pool
        beams: list[_Beam] = []
        for b in state.active:
            if bm.allocate(b.seq, 1):
                beams.append(b)
            else:
                state.finished.append(
                    (list(b.seq.token_ids), b.cum_logprob)
                )
                bm.free(b.seq)
                state.pool.append(b.seq)
                b.seq.on_hold = True
        state.active = beams
        if not beams:
            return

        w = state.width
        ids, lps = eng.runner.run_beam_decode([b.seq for b in beams], w)
        for b in beams:
            b.seq.num_computed_tokens += 1

        # global top-W across (beam, candidate)
        cands = []
        for j, b in enumerate(beams):
            for c in range(w):
                cands.append(
                    (b.cum_logprob + float(lps[j, c]), j, int(ids[j, c]))
                )
        cands.sort(reverse=True)
        selected = cands[:w]

        # split into continuing vs finishing
        new_beams: list[tuple[int, int, float]] = []  # (parent, token, score)
        for score, j, tok in selected:
            gen_len = (
                beams[j].seq.num_generated_tokens + 1
            )
            if tok in eos and not sp.ignore_eos:
                state.finished.append(
                    (list(beams[j].seq.token_ids) + [tok], score)
                )
            elif gen_len >= max_new:
                state.finished.append(
                    (list(beams[j].seq.token_ids) + [tok], score)
                )
            else:
                new_beams.append((j, tok, score))
        if len(state.finished) >= state.width:
            new_beams = []

        # assign parents -> children; first child keeps the parent's seq,
        # extras fork (shared full blocks + device tail-block copy)
        used_parent: set[int] = set()
        next_active: list[_Beam] = []
        copy_pairs: list[tuple[int, int]] = []
        for j, tok, score in new_beams:
            parent = beams[j]
            if j not in used_parent:
                used_parent.add(j)
                parent.seq.append_token(tok, 0.0)
                next_active.append(_Beam(parent.seq, score))
            else:
                if not state.pool:
                    continue  # width bounded by available sequences
                child = state.pool.pop()
                child.on_hold = False
                self._clone_into(parent.seq, child, tok)
                pair = bm.fork_blocks(parent.seq, child)
                if pair is not None:
                    copy_pairs.append(pair)
                next_active.append(_Beam(child, score))
        if copy_pairs:
            eng.runner.copy_kv_blocks(copy_pairs)
        # parents not selected at all release their blocks
        for j, b in enumerate(beams):
            if j not in used_parent:
                bm.free(b.seq)
                b.seq.block_ids = []
                state.pool.append(b.seq)
                b.seq.on_hold = True
        state.active = next_active

    def _clone_into(
        self, parent: Sequence, child: Sequence, tok: int
    ) -> None:
        child.token_ids = list(parent.token_ids[:-1]) + [tok]
        child.num_fixed_tokens = len(child.token_ids)
        child.num_computed_tokens = parent.num_computed_tokens
        child.on_hold = True  # stays out of the regular scheduler
        child.num_cached_tokens = 0
        child.output_logprobs = list(parent.output_logprobs)
        child.output_text = ""
        child.dp_rank = parent.dp_rank

    def _finalize(self, state: BeamState) -> None:
        req = state.request
        sp = req.sampling_params
        state.finished.sort(key=lambda f: f[1], reverse=True)
        n_prompt = len(req.prompt_token_ids)
        bm = self.engine.block_manager
        for seq in req.sequences:
            if seq.block_ids:
                bm.free(seq)
            seq.on_hold = False
        for i, seq in enumerate(req.sequences):
            if i < len(state.finished):
                toks, score = state.finished[i]
                seq.token_ids = list(toks)
                seq.num_computed_tokens = max(len(toks) - 1, 0)
                seq.num_fixed_tokens = len(toks)
                seq.beam_score = score
            elif state.finished:
                seq.token_ids = list(state.finished[0][0])
            seq.num_fixed_tokens = len(seq.token_ids)
            seq.finish(FinishReason.STOP)
