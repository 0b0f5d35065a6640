"""Continuous-batching scheduler.

Same control-plane policy as the reference scheduler
(/root/reference/scheduler.py:28-761) — prefill-priority selection, token-
budget admission with an adaptive new-token ratio, radix-prefix locking,
decode retraction under memory pressure, and a one-deep overlap pipeline —
re-architected for the JAX execution model:

- every device step is a bucketed, jitted program (tpusgl/runtime/steps.py);
  the scheduler only builds small int32 host arrays,
- sampling happens inside the step; the host sees one int32 array per step,
  fetched asynchronously (no per-token `.item()` syncs as in
  scheduler.py:544-545),
- the overlap schedule needs no worker thread or second stream
  (overlap_worker.py): submitting step N+1 before reading step N's tokens is
  just JAX async dispatch, and decode inputs come from the device-side
  last_token buffer,
- constrained requests work *with* overlap (the reference disables them,
  scheduler.py:632-637): the pipeline drains before a batch that needs a
  constraint mask, so the automaton always sees committed tokens,
- retraction keeps generated output and re-prefills prompt+output (the
  reference restarts from scratch and, in overlap mode, permanently skips
  commits for ever-retracted requests via the sticky is_retracted flag,
  scheduler.py:706-707 — a livelock; we tag submissions with a per-request
  epoch instead).

Known deliberate fix vs the reference: retraction frees
row[len(prefix_indices):seq_len] (the request-private suffix) rather than
row[num_cached_tokens:seq_len] (scheduler.py:333-336), which after
cache_unfinished_req would free tree-owned slots.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from tpusgl.config import EngineConfig, ModelConfig
from tpusgl.ops.sampling import SamplingArrays
from tpusgl.runtime.constraints import make_constraint_state
from tpusgl.runtime.memory_pool import ReqSlotPool, TokenSlotPool
from tpusgl.runtime.radix_cache import RadixCache
from tpusgl.runtime.request import Request
from tpusgl.runtime.sampling_params import SamplingParams
from tpusgl.runtime.state import EngineState
from tpusgl.runtime.steps import StepFunctions
from tpusgl.utils.bucketing import pick_bucket, round_up

logger = logging.getLogger(__name__)

NEG_INF_MASK = -1e30


@dataclass
class _Submission:
    """One in-flight device step awaiting host commit (cf. OverlapBatch,
    scheduler.py:21-25)."""

    mode: str  # "prefill" | "decode"
    requests: List[Request]
    epochs: List[int]
    next_ids_dev: object  # device array: [B_padded] or [K, B_padded]
    out_loc: np.ndarray  # [B] or [B, K] slots allocated for the new tokens
    window: int = 1  # decode steps folded into this submission


class Scheduler:
    def __init__(
        self,
        steps: StepFunctions,
        state: EngineState,
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig,
        tokenizer=None,
    ):
        self.steps = steps
        self.state = state
        self.model_cfg = model_cfg
        self.cfg = engine_cfg
        self.tokenizer = tokenizer

        self.req_pool = ReqSlotPool(engine_cfg.max_requests, engine_cfg.max_context_len)
        self.token_pool = TokenSlotPool(engine_cfg.max_total_tokens)
        self.tree = RadixCache()

        self.waiting: List[Request] = []
        self.decoding: List[Request] = []
        self.finished: List[Request] = []

        self.est_new_token_ratio = engine_cfg.new_token_ratio_init
        self._decay = (
            engine_cfg.new_token_ratio_init - engine_cfg.new_token_ratio_min
        ) / engine_cfg.new_token_ratio_decay_steps

        self.metrics = {
            "prefill_steps": 0,
            "decode_steps": 0,
            "decode_tokens": 0,
            "prefill_tokens": 0,
            "cached_tokens": 0,
            "retractions": 0,
            "ttft_s": [],
        }

    # ------------------------------------------------------------------ API

    def reset(self) -> None:
        self.req_pool.clear()
        self.token_pool.clear()
        self.tree.reset()
        self.waiting.clear()
        self.decoding.clear()
        self.finished.clear()
        self.est_new_token_ratio = self.cfg.new_token_ratio_init
        for v in self.metrics.values():
            if isinstance(v, list):
                v.clear()
        self.metrics.update(
            prefill_steps=0, decode_steps=0, decode_tokens=0,
            prefill_tokens=0, cached_tokens=0, retractions=0,
        )

    def run_batch(
        self,
        requests: Sequence[Sequence[int]],
        sampling: Optional[SamplingParams] = None,
        overlap: Optional[bool] = None,
    ) -> List[List[int]]:
        """Run all requests to completion (reference run_batch /
        run_batch_overlap, scheduler.py:99-169, 599-698)."""
        if sampling is None:
            sampling = SamplingParams()
        if overlap is None:
            overlap = self.cfg.enable_overlap

        self.waiting.clear()
        self.decoding.clear()
        self.finished.clear()
        self.est_new_token_ratio = self.cfg.new_token_ratio_init

        order: List[Request] = []
        for ids in requests:
            req = Request(
                input_ids=[int(t) for t in ids],
                max_new_tokens=min(sampling.max_new_tokens, self.cfg.max_total_tokens),
                eos_id=sampling.eos_id,
                temperature=sampling.temperature,
                top_k=sampling.top_k,
                top_p=sampling.top_p,
                do_sample=sampling.do_sample,
                repetition_penalty=sampling.repetition_penalty,
                constraint_state=make_constraint_state(
                    sampling.json_schema, self.tokenizer
                ),
            )
            self.waiting.append(req)
            order.append(req)
        if not order:
            return []

        pending: Optional[_Submission] = None
        while True:
            if len(self.finished) == len(order) and pending is None:
                break

            batch, mode = self._select_batch()
            if mode == "error" and pending is None:
                raise RuntimeError("Insufficient memory to process any requests")

            if pending is not None and any(
                r.constraint_state is not None for r in batch
            ):
                # Constraint masks must see committed tokens: drain the
                # pipeline first (depth drops to 0 for constrained batches —
                # vs the reference which disables constraints under overlap,
                # scheduler.py:632-637), then re-select since the commit may
                # have finished or re-queued requests.
                self._commit(pending)
                pending = None
                batch, mode = self._select_batch()
                if mode == "error":
                    # all finished -> loop top breaks; genuine OOM -> the
                    # next iteration raises through the normal error path
                    continue

            submitted: Optional[_Submission] = None
            if batch:
                if mode == "prefill":
                    submitted = self._run_prefill(batch)
                else:
                    submitted = self._run_decode(batch)

            if pending is not None:
                self._commit(pending)
            pending = submitted
            if pending is not None and not overlap:
                self._commit(pending)
                pending = None

        return [req.output_ids for req in order]

    def run_batch_static(
        self,
        requests: Sequence[Sequence[int]],
        sampling: Optional[SamplingParams] = None,
    ) -> List[List[int]]:
        """Chunk-of-max_requests static batching baseline
        (scheduler.py:171-240)."""
        out: List[List[int]] = []
        cs = self.cfg.max_requests
        for start in range(0, len(requests), cs):
            out.extend(self.run_batch(requests[start : start + cs], sampling))
        return out

    # -------------------------------------------------------------- selection

    def _select_batch(self) -> Tuple[List[Request], str]:
        if self.waiting:
            batch = self._try_select_prefill()
            if batch:
                return batch, "prefill"
        if self.decoding:
            batch = self._try_select_decode()
            if batch:
                return batch, "decode"
        return [], "error"

    def _try_select_prefill(self) -> List[Request]:
        """Token-budget admission (scheduler.py:258-301)."""
        for req in self.waiting:
            # Never let the cache cover the full input so at least one token
            # runs through the model (scheduler.py:264-268).
            req.prefix_indices, req.last_node = self.tree.match_prefix(
                req.full_ids[:-1]
            )
            req.num_cached_tokens = len(req.prefix_indices)

        self.waiting.sort(key=lambda r: len(r.prefix_indices), reverse=True)

        num_req_available = self.req_pool.available_size()
        r = self.est_new_token_ratio
        reserved = sum(
            min(
                int(r * req.remaining_new_tokens()),
                self.cfg.clip_max_new_tokens_estimation,
            )
            for req in self.decoding
        )
        rem_tokens = self.token_pool.available_size() - reserved

        can_run: List[Request] = []
        for req in self.waiting:
            self.tree.inc_lock_ref(req.last_node)
            try:
                new_tokens = len(req.full_ids) - req.num_cached_tokens
                total_needed = new_tokens + req.remaining_new_tokens()
                if (
                    len(can_run) + 1 <= num_req_available
                    and total_needed <= rem_tokens + self.tree.evictable_size()
                    and len(req.full_ids) + req.remaining_new_tokens()
                    <= self.cfg.max_context_len
                ):
                    rem_tokens -= total_needed
                    self.tree.inc_lock_ref(req.last_node)  # hold for the run
                    can_run.append(req)
                else:
                    break
            finally:
                self.tree.dec_lock_ref(req.last_node)
        return can_run

    def _try_select_decode(self) -> List[Request]:
        """Decode admission with eviction + retraction (scheduler.py:303-369)."""
        bs = len(self.decoding)
        if bs <= self.token_pool.available_size():
            self._decay_ratio()
            return list(self.decoding)

        self.tree.evict(bs, self.token_pool.free)
        if bs <= self.token_pool.available_size():
            self._decay_ratio()
            return list(self.decoding)

        while (
            len(self.decoding) * self.cfg.retract_decode_steps
            > self.token_pool.available_size()
        ):
            if not self.decoding:
                break
            req = self.decoding.pop()
            self._retract(req)
            residual = (
                len(self.decoding) * self.cfg.retract_decode_steps
                - self.token_pool.available_size()
            )
            if residual > 0:
                self.tree.evict(residual, self.token_pool.free)

        assert self.decoding, "retracted everything; nothing left to decode"

        total_decoded = sum(len(r.output_ids) for r in self.decoding)
        total_max = sum(r.max_new_tokens for r in self.decoding)
        self.est_new_token_ratio = min(
            1.0,
            (total_decoded + len(self.decoding) * self.cfg.retract_decode_steps)
            / max(1, total_max),
        )
        return list(self.decoding)

    def _decay_ratio(self) -> None:
        self.est_new_token_ratio = max(
            self.cfg.new_token_ratio_min, self.est_new_token_ratio - self._decay
        )

    def _retract(self, req: Request) -> None:
        """Free the request-private suffix, unlock the prefix, requeue
        (scheduler.py:320-357; suffix start fixed, see module docstring)."""
        self.metrics["retractions"] += 1
        private = self.req_pool.row(req.req_pool_idx, req.seq_len)[
            len(req.prefix_indices) :
        ]
        self.token_pool.free(private)
        self.req_pool.free(req.req_pool_idx)
        if req.last_node is not None:
            self.tree.dec_lock_ref(req.last_node)
        req.retract()  # bumps req.epoch
        self.waiting.append(req)

    # -------------------------------------------------------------- execution

    def _run_prefill(self, batch: List[Request]) -> _Submission:
        """Prefill the admitted set, one [1, S]-bucketed step per request
        (the reference packs a ragged concat, scheduler.py:381-452; dense
        per-request steps keep shapes static for XLA)."""
        next_ids_list = []
        out_locs = []
        C = self.cfg.max_context_len
        for req in batch:
            prompt = req.full_ids
            ext = len(prompt) - req.num_cached_tokens
            assert ext >= 1
            req_idx = self.req_pool.alloc()
            if req_idx is None:
                raise RuntimeError("Failed to allocate request slot")

            slots = self.token_pool.alloc(ext)
            if slots is None:
                self.tree.evict(ext, self.token_pool.free)
                slots = self.token_pool.alloc(ext)
            if slots is None:
                avail = self.token_pool.available_size() + self.tree.evictable_size()
                raise RuntimeError(f"Prefill OOM: need {ext}, available {avail}")

            # Build the full page-table row on host (mirror is authoritative).
            row = np.zeros((C,), np.int32)
            row[: req.num_cached_tokens] = req.prefix_indices
            row[req.num_cached_tokens : len(prompt)] = slots
            self.req_pool.req_to_token[req_idx] = row
            req.req_pool_idx = req_idx
            req.seq_len = len(prompt)
            req.is_retracted = False

            S = pick_bucket(ext, self.cfg.prefill_len_buckets)
            kv_len = self._kv_bucket(len(prompt))
            ids_pad = np.zeros((1, S), np.int32)
            ids_pad[0, :ext] = prompt[req.num_cached_tokens :]
            loc_pad = np.zeros((1, S), np.int32)
            loc_pad[0, :ext] = slots

            penalty_ids = self._penalty_ids(req)
            cmask = self._constraint_mask([req])

            self.state, next_ids = self.steps.prefill(
                S, kv_len, self.state,
                np.array([req_idx], np.int32),
                ids_pad,
                row[None, :],
                np.array([len(prompt)], np.int32),
                np.array([req.num_cached_tokens], np.int32),
                loc_pad,
                self._samp_arrays([req]),
                penalty_ids,
                cmask,
                simple=self._is_simple([req]) and not req.output_ids,
            )
            next_ids_list.append(next_ids)
            out_locs.append(slots[-1] if ext > 0 else 0)
            self.metrics["prefill_steps"] += 1
            self.metrics["prefill_tokens"] += ext
            self.metrics["cached_tokens"] += req.num_cached_tokens

        # Eager queue transition (scheduler.py:676-681): decode may be
        # scheduled before these commits; inputs come from device last_token.
        for req in batch:
            if req in self.waiting:
                self.waiting.remove(req)
            if req not in self.decoding:
                self.decoding.append(req)
            req.inflight_steps += 1

        stacked = jnp.concatenate(next_ids_list)
        return _Submission(
            mode="prefill",
            requests=list(batch),
            epochs=[r.epoch for r in batch],
            next_ids_dev=stacked,
            out_loc=np.array(out_locs, np.int32),
        )

    def _pick_window(self, batch: List[Request]) -> int:
        """How many decode steps to fold into one program. Constrained
        requests need a fresh host mask every token -> 1; otherwise bounded
        by config, per-request context-row headroom, and free KV slots."""
        K = self.cfg.decode_window
        if K <= 1 or any(r.constraint_state is not None for r in batch):
            return 1
        for req in batch:
            K = min(K, self.cfg.max_context_len - req.seq_len)
        K = min(K, max(1, self.token_pool.available_size() // len(batch)))
        return max(1, K)

    def _run_decode(self, batch: List[Request]) -> _Submission:
        """One fused decode program for the whole batch covering `window`
        steps (vs the reference's one host round-trip per token,
        scheduler.py:454-546). Tokens generated past eos/max_new inside the
        window are rolled back at commit."""
        B = len(batch)
        K = self._pick_window(batch)
        slots = self.token_pool.alloc(B * K)
        if slots is None:
            raise RuntimeError("Failed to allocate KV slots for decode")
        slots = slots.reshape(B, K)

        Bb = pick_bucket(B, self.cfg.decode_bs_buckets)
        R = self.cfg.max_requests  # dummy row index
        req_indices = np.full((Bb,), R, np.int32)
        seq_lens0 = np.ones((Bb,), np.int32)
        out_loc = np.zeros((Bb, K), np.int32)

        max_len = 0
        for i, req in enumerate(batch):
            assert req.req_pool_idx is not None
            self.req_pool.req_to_token[
                req.req_pool_idx, req.seq_len : req.seq_len + K
            ] = slots[i]
            req.seq_len += K
            req_indices[i] = req.req_pool_idx
            seq_lens0[i] = req.seq_len - K + 1  # length incl. first new token
            out_loc[i] = slots[i]
            max_len = max(max_len, req.seq_len)
            req.inflight_steps += 1

        kv_len = self._kv_bucket(max_len)
        samp = self._samp_arrays(batch, padded=Bb)
        simple = self._is_simple(batch)
        if K == 1:
            cmask = self._constraint_mask(batch, padded=Bb)
            self.state, next_ids = self.steps.decode_with_kv_len(
                kv_len, self.state, req_indices, seq_lens0, out_loc[:, 0],
                samp, cmask, simple=simple,
            )
            next_ids = next_ids[None, :]  # [1, Bb]
        else:
            self.state, next_ids = self.steps.decode_multi(
                kv_len, K, self.state, req_indices, seq_lens0, out_loc, samp,
                simple=simple,
            )
        self.metrics["decode_steps"] += 1
        self.metrics["decode_tokens"] += B * K
        return _Submission(
            mode="decode",
            requests=list(batch),
            epochs=[r.epoch for r in batch],
            next_ids_dev=next_ids,
            out_loc=slots,
            window=K,
        )

    def _kv_bucket(self, max_len: int) -> int:
        b = round_up(max(max_len, 1), self.cfg.kv_len_bucket)
        return min(b, self.cfg.max_context_len)

    @staticmethod
    def _is_simple(batch: List[Request]) -> bool:
        """True when no request needs top-k/top-p/penalty/constraints — the
        steps then use the fast sampling path with no presence matrix."""
        return all(
            r.top_k <= 0
            and r.top_p >= 1.0
            and r.repetition_penalty <= 1.0
            and r.constraint_state is None
            for r in batch
        )

    def _samp_arrays(self, batch: List[Request], padded: Optional[int] = None):
        B = padded or len(batch)
        temp = np.ones((B,), np.float32)
        top_k = np.zeros((B,), np.int32)
        top_p = np.ones((B,), np.float32)
        do_sample = np.zeros((B,), np.bool_)
        penalty = np.ones((B,), np.float32)
        for i, r in enumerate(batch):
            temp[i] = r.temperature
            top_k[i] = r.top_k
            top_p[i] = r.top_p
            do_sample[i] = r.do_sample
            penalty[i] = r.repetition_penalty
        return SamplingArrays(temp, top_k, top_p, do_sample, penalty)

    def _penalty_ids(self, req: Request, bucket: int = 64) -> np.ndarray:
        """Prior output ids for presence-rebuild at (re-)prefill; padded with
        vocab_size which scatters with mode=drop."""
        ids = sorted(set(req.output_ids))
        K = round_up(max(len(ids), 1), bucket)
        out = np.full((1, K), self.model_cfg.vocab_size, np.int32)
        out[0, : len(ids)] = ids
        return out

    def _constraint_mask(
        self, batch: List[Request], padded: Optional[int] = None
    ) -> Optional[np.ndarray]:
        if all(r.constraint_state is None for r in batch):
            return None
        B = padded or len(batch)
        V = self.model_cfg.vocab_size
        mask = np.zeros((B, V), np.float32)
        for i, req in enumerate(batch):
            if req.constraint_state is None:
                continue
            allowed = req.constraint_state.allowed_tokens(req.output_ids)
            if len(allowed) == 0:
                raise RuntimeError("No available token due to constraint decoding")
            mask[i, :] = NEG_INF_MASK
            mask[i, np.asarray(allowed, np.int64)] = 0.0
        return mask

    # ---------------------------------------------------------------- commit

    def _commit(self, sub: _Submission) -> None:
        """Fetch the submission's tokens and update host state — the merge of
        the reference's _process_results (scheduler.py:548-589) and
        _process_results_overlap (scheduler.py:700-761), generalized to
        decode windows."""
        next_ids = np.asarray(sub.next_ids_dev)  # D2H sync point

        if sub.mode == "prefill":
            for i, req in enumerate(sub.requests):
                if req.epoch != sub.epochs[i]:
                    continue  # submitted before a retraction; discard
                req.inflight_steps -= 1
                next_id = int(next_ids[i])
                req.output_ids.append(next_id)
                req.finished = len(req.output_ids) >= req.max_new_tokens or (
                    req.eos_id != -1 and next_id == req.eos_id
                )
                if req.finished:
                    self._cache_finished(req)
                    self.finished.append(req)
                    if req in self.decoding:
                        self.decoding.remove(req)
                else:
                    # Cache only tokens whose KV exists: everything but the
                    # token sampled by this very step (scheduler.py:725-727).
                    self._cache_unfinished(req, req.full_ids[:-1])
            return

        # decode: next_ids is [K, B]
        K = sub.window
        for i, req in enumerate(sub.requests):
            if req.epoch != sub.epochs[i]:
                continue  # retracted mid-flight; its slots were freed there
            req.inflight_steps -= 1

            if req.finished:
                # Whole window was speculative for an already-finished
                # request (scheduler.py:740-746, generalized).
                self.token_pool.free(sub.out_loc[i].reshape(-1))
                continue

            accepted = 0
            for k in range(K):
                next_id = int(next_ids[k, i])
                req.output_ids.append(next_id)
                accepted += 1
                if len(req.output_ids) >= req.max_new_tokens or (
                    req.eos_id != -1 and next_id == req.eos_id
                ):
                    req.finished = True
                    break
            if accepted < K:
                # Roll back the speculative tail of the window.
                self.token_pool.free(sub.out_loc[i, accepted:])
                req.seq_len -= K - accepted

            if req.finished:
                self._cache_finished(req)
                self.finished.append(req)

        self.decoding = [r for r in self.decoding if not r.finished]

    # ------------------------------------------------------------- radix glue

    def _cache_finished(self, req: Request) -> None:
        """radix_cache.py:142-172 semantics over the host mirror."""
        token_ids = req.full_ids[:-1] if req.output_ids else list(req.input_ids)
        if not token_ids:
            self.req_pool.free(req.req_pool_idx)
            self.tree.dec_lock_ref(req.last_node)
            req.req_pool_idx = None
            return
        kv_indices = self.req_pool.row(req.req_pool_idx, len(token_ids)).copy()
        new_prefix_len = self.tree.insert(token_ids, kv_indices)
        if new_prefix_len > len(req.prefix_indices):
            self.token_pool.free(kv_indices[len(req.prefix_indices) : new_prefix_len])
        self.req_pool.free(req.req_pool_idx)
        self.tree.dec_lock_ref(req.last_node)
        req.req_pool_idx = None
        req.last_node = None

    def _cache_unfinished(self, req: Request, token_ids: List[int]) -> None:
        """radix_cache.py:174-205 semantics; re-syncs the device page-table
        row when slot indices were swapped to canonical tree copies."""
        if not token_ids:
            return
        kv_indices = self.req_pool.row(req.req_pool_idx, len(token_ids)).copy()
        new_prefix_len = self.tree.insert(token_ids, kv_indices)
        if new_prefix_len > len(req.prefix_indices):
            self.token_pool.free(kv_indices[len(req.prefix_indices) : new_prefix_len])

        new_indices, new_last_node = self.tree.match_prefix(token_ids)
        assert len(new_indices) == len(token_ids), (
            len(new_indices), len(token_ids),
        )
        changed = not np.array_equal(kv_indices, new_indices)
        if changed:
            self.req_pool.write_row(req.req_pool_idx, new_indices)
            self.state = self.steps.write_table_row(
                self.state,
                np.int32(req.req_pool_idx),
                self.req_pool.req_to_token[req.req_pool_idx],
            )
        self.tree.dec_lock_ref(req.last_node)
        self.tree.inc_lock_ref(new_last_node)
        req.prefix_indices = new_indices
        req.last_node = new_last_node
