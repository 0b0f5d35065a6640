import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from tpusgl.config import EngineConfig, resolve_model_config
from tpusgl.models import qwen2
from tpusgl.ops.attention import write_kv
from tpusgl.ops.paged_attention import pallas_attention
from tpusgl.ops.sampling import SamplingArrays
from tpusgl.runtime.state import init_state
from tpusgl.runtime.steps import StepFunctions

def attn_stub(layer_idx, q, k, v, kv_l, meta):          # no write, no read
    return q, kv_l

def attn_write_only(layer_idx, q, k, v, kv_l, meta):    # scatter only
    kv_l = write_kv(k, v, kv_l, meta.out_loc)
    return q, kv_l

def run(name, attn, W=8, B=256, P=64, BP=4, LEN=1024, paged=True):
    cfg = resolve_model_config("qwen2.5-0.5b")
    ecfg = EngineConfig(max_total_tokens=B*2048, max_requests=B, page_size=P,
                        pages_per_block=BP, decode_bs_buckets=(B,),
                        kv_len_bucket=512, decode_window=W)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    state = init_state(cfg, ecfg, kv_dtype=jnp.bfloat16)
    steps = StepFunctions(params, cfg, ecfg, attn_impl=attn, paged_kernel=paged)
    rng = np.random.default_rng(0)
    ri = np.arange(B, dtype=np.int32)
    sl = np.full((B,), LEN, np.int32)
    ol = rng.integers(P, B*2048, (B, W)).astype(np.int32)
    pt = rng.integers(1, B*2048//P, (B, ecfg.pages_per_seq)).astype(np.int32)
    sa = SamplingArrays.full(B, temperature=0.6, do_sample=True)
    state, ids = steps.decode(2048, W, state, ri, sl, ol, pt, sa, None, simple=True)
    np.asarray(ids)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, ids = steps.decode(2048, W, state, ri, sl, ol, pt, sa, None, simple=True)
        np.asarray(ids)
    dt = (time.perf_counter()-t0)/n
    print(f"{name}: {dt*1e3:.1f}ms/program ({dt/W*1e3:.1f}ms/step) -> {B*W/dt:.0f} tok/s", flush=True)

#run("stub (no attn, no write)", attn_stub)
#run("write-only (scatter)    ", attn_write_only)
#run("pallas kernel           ", functools.partial(pallas_attention, page_size=64, pages_per_block=4))

run("pallas P=128 BP=2", functools.partial(pallas_attention, page_size=128, pages_per_block=2), P=128, BP=2)
run("pallas P=256 BP=1", functools.partial(pallas_attention, page_size=256, pages_per_block=1), P=256, BP=1)
run("pallas P=256 BP=2", functools.partial(pallas_attention, page_size=256, pages_per_block=2), P=256, BP=2)
run("pallas P=512 BP=1", functools.partial(pallas_attention, page_size=512, pages_per_block=1), P=512, BP=1)
