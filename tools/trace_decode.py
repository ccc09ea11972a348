"""Capture a jax profiler trace of prepare + decode_one at 720p and print
the top ops by self time (parsed from the trace.json.gz event dump)."""

from __future__ import annotations

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="736x1280")
    ap.add_argument("--ds", type=float, default=None)
    args = ap.parse_args()
    h, w = (int(s) for s in args.size.split("x"))
    ds = args.ds
    model = GIMMVFI_R(raft_iters=20, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    var_shapes = jax.eval_shape(lambda r, x: model.init(r, x, (0.5,)), rng, small)
    key = jax.random.PRNGKey(2)
    variables = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(key, s.shape, jnp.float32) * 0.02).astype(s.dtype)
        if s.dtype == jnp.float32
        else jnp.zeros(s.shape, s.dtype),
        var_shapes,
    )
    img_xs = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, h, w, 3))

    prep_fn = jax.jit(lambda v, x: model.apply(v, x, ds, method=model.prepare))
    prep = prep_fn(variables, img_xs)
    dec_fn = jax.jit(
        lambda v, p, t: model.apply(v, p, t, method=model.decode_one)["imgt_pred"]
    )
    out = dec_fn(variables, prep, jnp.float32(0.5))
    float(jnp.asarray(out).mean())

    trace_dir = f"/tmp/trace_{h}x{w}_ds{ds}"
    with jax.profiler.trace(trace_dir):
        p2 = prep_fn(variables, img_xs)
        float(jnp.asarray(p2["nflows"]).astype(jnp.float32).mean())
        o2 = dec_fn(variables, prep, jnp.float32(0.5))
        float(jnp.asarray(o2).mean())

    time.sleep(2)
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files found under", trace_dir)
        sys.exit(1)
    f = max(files, key=lambda p: len(p))
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)

    events = data.get("traceEvents", [])
    # keep TPU op events (those with dur and a name that isn't a metadata row)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid_name = e.get("pid")
        name = e.get("name", "")
        args = e.get("args", {})
        cat = args.get("l", "") if isinstance(args, dict) else ""
        # heuristics: XLA op events carry 'run_id'/'hlo_category' style args
        hlo_cat = args.get("hlo_category") if isinstance(args, dict) else None
        if hlo_cat is None:
            continue
        key = (hlo_cat, name.split(".")[0])
        tot[key] += e["dur"]
        cnt[key] += 1

    if not tot:
        # fallback: group every X event by name prefix
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            key = ("", e.get("name", "")[:60])
            tot[key] += e["dur"]
            cnt[key] += 1

    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:45]
    print(f"{'us_total':>12} {'count':>7}  category / op")
    for (cat, name), us in rows:
        print(f"{us:12.0f} {cnt[(cat, name)]:7d}  {cat:18s} {name}")

    # also: total per category
    bycat = defaultdict(float)
    for (cat, name), us in tot.items():
        bycat[cat] += us
    print("\nby category:")
    for cat, us in sorted(bycat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{us:12.0f}  {cat}")


if __name__ == "__main__":
    main()
