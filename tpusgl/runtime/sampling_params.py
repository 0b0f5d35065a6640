"""User-facing sampling parameters (reference: sample.py:8-17)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional


@dataclass
class SamplingParams:
    max_new_tokens: int = 64
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    eos_id: int = -1
    do_sample: bool = False
    repetition_penalty: float = 1.0
    json_schema: Optional[Dict[str, Any]] = None
    # Accept inter-token whitespace in schema-constrained output (runs capped
    # at 12 chars) instead of enforcing canonical spacing-free JSON.
    json_whitespace: bool = False
