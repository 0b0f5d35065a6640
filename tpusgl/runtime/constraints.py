"""Constrained decoding.

The reference delegates to lm-format-enforcer
(/root/reference/constraints.py:19-42); that package is not available here,
so the token-level JSON-schema automaton is implemented natively in
tpusgl/runtime/json_fsm.py. This module holds the engine-facing interface:
a ConstraintState yields the set of allowed next-token ids for the current
generated suffix, and the scheduler turns that into an additive logit mask
shipped to the device (fused into sampling, unlike the reference's host-side
mask add at constraints.py:26-38).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np


class ConstraintState:
    """Interface (reference constraints.py:11-16)."""

    def allowed_tokens(self, output_ids: Sequence[int]) -> np.ndarray:
        """Allowed next-token ids given the generated-so-far suffix."""
        raise NotImplementedError

    def reset(self) -> None:
        raise NotImplementedError


def make_constraint_state(
    schema: Optional[Dict[str, Any]], tokenizer, whitespace: bool = False
) -> Optional[ConstraintState]:
    if schema is None:
        return None
    if tokenizer is None:
        raise ValueError("JSON-schema constrained decoding requires a tokenizer")
    from tpusgl.runtime.json_fsm import JsonConstraintState

    return JsonConstraintState(schema, tokenizer, whitespace=whitespace)
