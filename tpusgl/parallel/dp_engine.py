"""Data-parallel serving: independent engine replicas over disjoint device
groups.

The right DP for serving is NOT an in-graph batch axis (a replicated batch
buys nothing, and a sharded batch would force every replica to run the same
schedule): each replica is a full engine — its own weights copy, KV pool,
radix cache, and continuous-batching scheduler — over its own tp-sized slice
of the device list (SURVEY.md §2 "DP across pod slices is the natural free
extra"). Requests are routed by load; the replicas' scheduler loops are
interleaved on one host thread, so while replica A's step executes on its
chips, replica B's host work proceeds — the same async-dispatch overlap the
single-engine schedule uses, across replicas.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax

from tpusgl.config import EngineConfig
from tpusgl.runtime.engine import Engine
from tpusgl.runtime.sampling_params import SamplingParams


class DataParallelEngine:
    """dp independent Engine replicas, each tensor-parallel over tp chips.

    Requires dp * tp <= len(jax.devices()). `generate` routes requests to the
    least-loaded replica (by queued prompt tokens) and runs all replicas'
    scheduler loops interleaved to completion.
    """

    def __init__(
        self,
        model_id: str = "qwen2.5-0.5b",
        dp: int = 2,
        engine_cfg: Optional[EngineConfig] = None,
        **engine_kwargs,
    ):
        cfg = engine_cfg or EngineConfig.from_env()
        tp = cfg.tp
        devices = jax.devices()
        assert dp * tp <= len(devices), (dp, tp, len(devices))
        assert dp >= 1
        self.dp = dp
        # Each replica gets a 1 x tp mesh over its own chips (tp == 1 runs
        # unsharded on a single chip per replica).
        rep_cfg = cfg.replace(dp=1)
        self.replicas: List[Engine] = [
            Engine(
                model_id,
                engine_cfg=rep_cfg,
                devices=devices[i * tp : (i + 1) * tp] if tp > 1 else
                [devices[i]],
                **engine_kwargs,
            )
            for i in range(dp)
        ]
        self.tokenizer = self.replicas[0].tokenizer

    def reset(self) -> None:
        for rep in self.replicas:
            rep.reset()

    def generate(
        self,
        requests: Sequence[Union[str, Sequence[int]]],
        sampling: Optional[SamplingParams] = None,
        enable_overlap: Optional[bool] = None,
    ) -> List[Union[str, List[int]]]:
        if sampling is None:
            sampling = SamplingParams()
        if sampling.eos_id == -1 and self.tokenizer is not None:
            eos = getattr(self.tokenizer, "eos_token_id", None)
            if eos is not None:
                sampling.eos_id = eos
        token_reqs = self.replicas[0]._encode(requests)

        # Route to the least-loaded replica by queued prompt tokens.
        load = [0] * self.dp
        order = []
        for ids in token_reqs:
            r = min(range(self.dp), key=load.__getitem__)
            req = self.replicas[r].scheduler.make_request(ids, sampling)
            self.replicas[r].scheduler.waiting.append(req)
            load[r] += len(ids) + req.max_new_tokens
            order.append(req)

        # Interleave the replicas' serving loops: each next() submits /
        # commits one step on that replica, then yields the host — replica
        # steps overlap across device groups via async dispatch.
        #
        # Readiness-aware (round-3 weakness: plain round-robin blocked on
        # each replica's commit IN TURN, so one slow replica serialized the
        # host against every fast one): a replica whose in-flight step has
        # not completed on device (scheduler._pending_sub not ready) is
        # skipped this sweep; only when EVERY live replica is device-busy
        # does the host block — on the least-recently-submitted one.
        gens = [
            rep.scheduler.step_events(enable_overlap) for rep in self.replicas
        ]
        live = set(range(self.dp))

        def ready(r: int) -> bool:
            sub = getattr(self.replicas[r].scheduler, "_pending_sub", None)
            if sub is None:
                return True
            try:
                return all(
                    x.is_ready() if hasattr(x, "is_ready") else True
                    for x in jax.tree.leaves(sub.next_ids_dev)
                )
            except Exception:
                return True

        def submit_t(r: int) -> float:
            sub = getattr(self.replicas[r].scheduler, "_pending_sub", None)
            return sub.submit_t if sub is not None else 0.0

        while live:
            progressed = False
            for r in list(live):
                if not ready(r):
                    continue
                try:
                    next(gens[r])
                except StopIteration:
                    live.discard(r)
                progressed = True
            if not progressed and live:
                r = min(live, key=submit_t)
                try:
                    next(gens[r])
                except StopIteration:
                    live.discard(r)

        outputs = [req.output_ids for req in order]
        if self.tokenizer is not None and requests and isinstance(requests[0], str):
            return [self.tokenizer.decode(ids) for ids in outputs]
        return outputs

    @property
    def metrics(self):
        return [rep.metrics for rep in self.replicas]
