import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from tpusgl.config import EngineConfig, QuantConfig, resolve_model_config
from tpusgl.models import qwen2
from tpusgl.ops.paged_attention import pallas_attention
from tpusgl.ops.sampling import SamplingArrays
from tpusgl.runtime.state import init_state
from tpusgl.runtime.steps import StepFunctions

def mk(W, B, P, BP, LEN=1024):
    cfg = resolve_model_config("qwen2.5-0.5b")
    ecfg = EngineConfig(
        max_total_tokens=B*2048, max_requests=B, page_size=P, pages_per_block=BP,
        decode_bs_buckets=(B,), kv_len_bucket=512, decode_window=W)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    state = init_state(cfg, ecfg, kv_dtype=jnp.bfloat16)
    attn = functools.partial(pallas_attention, page_size=P, pages_per_block=BP)
    steps = StepFunctions(params, cfg, ecfg, attn_impl=attn, paged_kernel=True)
    rng = np.random.default_rng(0)
    args = (np.arange(B, dtype=np.int32), np.full((B,), LEN, np.int32),
            rng.integers(P, B*2048, (B, W)).astype(np.int32),
            rng.integers(1, B*2048//P, (B, ecfg.pages_per_seq)).astype(np.int32),
            SamplingArrays.full(B, temperature=0.6, do_sample=True))
    return cfg, ecfg, steps, state, args

def timed(name, W, B, P, BP, n=5):
    cfg, ecfg, steps, state, (ri, sl, ol, pt, sa) = mk(W, B, P, BP)
    state, ids = steps.decode(2048, W, state, ri, sl, ol, pt, sa, None, simple=True)
    np.asarray(ids)
    t0 = time.perf_counter()
    for _ in range(n):
        state, ids = steps.decode(2048, W, state, ri, sl, ol, pt, sa, None, simple=True)
        np.asarray(ids)
    dt = (time.perf_counter()-t0)/n
    print(f"{name}: {dt*1e3:.1f}ms/program -> {B*W/dt:.0f} tok/s", flush=True)
    return dt

timed("W=1 B=256 P=64 BP=4", 1, 256, 64, 4)
timed("W=8 B=256 P=64 BP=4", 8, 256, 64, 4)
timed("W=1 B=32  P=64 BP=4", 1, 32, 64, 4)
timed("W=8 B=32  P=64 BP=4", 8, 32, 64, 4)
