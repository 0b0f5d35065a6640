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

wd = sys.argv[1] if len(sys.argv) > 1 else "bf16"
W = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 256
P = int(sys.argv[4]) if len(sys.argv) > 4 else 64
BP = int(sys.argv[5]) if len(sys.argv) > 5 else 4
LEN = 1024

cfg = resolve_model_config("qwen2.5-0.5b")
ecfg = EngineConfig(
    max_total_tokens=B*2048, max_requests=B, page_size=P, pages_per_block=BP,
    decode_bs_buckets=(B,), kv_len_bucket=512, decode_window=W,
    quant=QuantConfig(weight_dtype=wd),
)
params = qwen2.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
if wd != "bf16":
    from tpusgl.loader.safetensors_loader import quantize_params
    params = quantize_params(params, ecfg.quant)
state = init_state(cfg, ecfg, kv_dtype=jnp.bfloat16)
attn = functools.partial(pallas_attention, page_size=P, pages_per_block=BP)
steps = StepFunctions(params, cfg, ecfg, attn_impl=attn, paged_kernel=True)

rng = np.random.default_rng(0)
pps = ecfg.pages_per_seq
req_indices = np.arange(B, dtype=np.int32)
seq_lens0 = np.full((B,), LEN, np.int32)
out_loc = rng.integers(P, B*2048, (B, W)).astype(np.int32)
page_tbl = rng.integers(1, B*2048//P, (B, pps)).astype(np.int32)
samp = SamplingArrays.full(B, temperature=0.6, do_sample=True)

t0 = time.perf_counter()
state, ids = steps.decode(2048, W, state, req_indices, seq_lens0, out_loc, page_tbl, samp, None, simple=True)
jax.block_until_ready(ids)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
N = 20
t0 = time.perf_counter()
for _ in range(N):
    state, ids = steps.decode(2048, W, state, req_indices, seq_lens0, out_loc, page_tbl, samp, None, simple=True)
jax.block_until_ready(ids)
dt = (time.perf_counter()-t0)/N
tput = B*W/dt
kv_bytes = B*LEN*cfg.kv_size*2*2*cfg.num_hidden_layers*W
print(f"decode window={W} B={B} P={P} BP={BP} w={wd}: {dt*1e3:.1f}ms/program -> {tput:.0f} tok/s; attn-stream {kv_bytes/dt/1e9:.0f} GB/s-equiv", flush=True)

# block_until_ready may be async-completing on the axon remote backend;
# force a real D2H fetch per iteration.
t0 = time.perf_counter()
for _ in range(N):
    state, ids = steps.decode(2048, W, state, req_indices, seq_lens0, out_loc, page_tbl, samp, None, simple=True)
    _ = np.asarray(ids)
dt = (time.perf_counter()-t0)/N
print(f"with D2H fetch: {dt*1e3:.1f}ms/program -> {B*W/dt:.0f} tok/s", flush=True)
