"""Profiler-based timing harness for the axon relay (see PERF.md round-2
methodology): device time of a jitted scan with fresh args per call.

The relay elides repeated identical executions and block_until_ready does
not reliably wait, so ONLY device-profiler sums of in-program scans are
trustworthy here."""
import glob, gzip, json, tempfile, shutil
from pathlib import Path
import jax, jax.numpy as jnp

def _program_ms(trace_dir, tag):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    tot = 0.0
    for f in files:
        trace = json.loads(gzip.decompress(Path(f).read_bytes()))
        events = trace.get("traceEvents", [])
        device_pids = {ev.get("pid") for ev in events
                       if ev.get("ph")=="M" and ev.get("name")=="process_name"
                       and "TPU" in ev.get("args",{}).get("name","")}
        for ev in events:
            if ev.get("ph")=="X" and ev.get("pid") in device_pids and ev.get("name","").startswith(tag):
                tot += ev.get("dur",0)/1000.0
    return tot

_uniq = [0]

def bench_step(name, step, x0, iters=20, flops=None, unit_bytes=None):
    """Returns device ms per iteration of `step` (carry -> carry)."""
    _uniq[0] += 1
    tag = f"bs{_uniq[0]}"
    def scan_fn(c):
        out, _ = jax.lax.scan(lambda c, _: (step(c), None), c, None, length=iters)
        return jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)), out)
    scan_fn.__name__ = tag
    run = jax.jit(scan_fn)
    def fresh(i):
        return jax.tree.map(lambda t: t + jnp.asarray(i % 5, t.dtype) * jnp.asarray(1e-6, t.dtype), x0)
    try:
        [float(x) for x in jax.tree.leaves(run(fresh(0)))]  # compile + warm
    except Exception as e:
        print(f"{name:46s} FAILED {str(e)[:110]}", flush=True)
        return None
    d = tempfile.mkdtemp(prefix="bs_")
    with jax.profiler.trace(d):
        [float(x) for x in jax.tree.leaves(run(fresh(1)))]
    ms = _program_ms(d, f"jit_{tag}") / iters
    shutil.rmtree(d, ignore_errors=True)
    msg = f"{name:46s} {ms:8.3f} ms"
    if flops: msg += f"  {flops/(ms/1e3)/1e12:6.1f} TF/s"
    if unit_bytes: msg += f"  {unit_bytes/(ms/1e3)/1e9:6.1f} GB/s"
    print(msg, flush=True)
    return ms
