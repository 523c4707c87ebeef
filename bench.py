"""Benchmark: the BASELINE.md north-star metrics on real hardware.

Modes (all on production shapes — SigLIP ViT-L/16-384 tower, 1024->10240->1152 projector,
Gemma3-1B-shape decoder with 262k vocab — synthetic data, Pallas flash attention):

- ``stage1`` (default, driver-recorded): projector-alignment train step ->
  images/sec/chip + MFU (frozen bf16 towers + stop-gradient masks, fused CE).
- ``stage1-8b``: same against the frozen Qwen3-8B shape (int8 base — the reference
  QLoRA-loads its frozen stage-1 LLM too).
- ``stage0``: so400m-p16-512 SigLIP contrastive step (frozen text tower) ->
  images/sec/chip.
- ``stage2``: QLoRA VQA train step (575 visual + 256 q + 1024 a bucket) -> tokens/sec.
- ``stage2-8b``: same at the Qwen3-8B shape (int8 base) the reference actually trains.
- ``gen``: KV-cache generation at the REFERENCE inference config (1024 new tokens,
  3 beams, beam-multinomial sampling + penalties) -> p50 latency.
- ``flash-check`` / ``ce-check``: on-hardware numeric validation of the Mosaic-compiled
  Pallas kernels vs their XLA paths (fwd + grads, production shapes).
- ``pipeline``: host-side JPEG decode + fused C++ augment+preprocess throughput.
- ``stage1-tiny``: CPU-runnable smoke variant.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"(, "mfu")}. The reference
publishes no numbers (BASELINE.md), so vs_baseline compares against the prior round's
recorded BENCH_r*.json when present, else null. Timing uses per-step host readbacks (the
tunneled runtime's block_until_ready is not a true sync).

Usage: python bench.py [--mode ...] [--batch N] [--steps N] [--remat full|dots|none]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


PEAK_BF16_FLOPS = {
    # per-chip peak bf16 matmul FLOP/s by device_kind substring
    "v4": 275e12,
    "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
    "v5p": 459e12, "v5": 459e12,
    "v6 lite": 918e12, "v6e": 918e12, "trillium": 918e12,
}


def _peak_flops_per_chip() -> float:
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, val in PEAK_BF16_FLOPS.items():
        if key in kind:
            return val
    return 197e12  # default to v5e


def _step_flops(jitted, *args) -> float:
    """XLA's own FLOP estimate for one call (0.0 when the backend can't report it)."""
    try:
        lowered = jitted.lower(*args)
        try:
            analysis = lowered.cost_analysis()  # no backend compile needed
        except Exception:
            analysis = None
        if analysis is None:
            # backend doesn't report pre-compile analysis (axon); compile — the
            # persistent compile cache (enable_compile_cache) makes this cheap and the
            # jit call afterwards reuses the cached executable from disk
            analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return 0.0


def _mfu(flops_per_step: float, step_seconds: float, n_chips: int) -> float:
    if not flops_per_step or not step_seconds:
        return 0.0
    return flops_per_step / step_seconds / (n_chips * _peak_flops_per_chip())


# Nominal time of the calibration kernel (_calibrate: 48 chained 8192^3 bf16
# matmuls, one dispatch, ~81% MFU) on the v5e chip this bench records on — a pure-MXU
# health probe. IMPORTANT NEGATIVE RESULT (r3): the chip's episodic 1.32x step-time
# bimodality (BENCH_EXTRA_r04 chip_step_time_bimodality) does NOT slow this kernel —
# measured 329-331 ms while identical stage-1 steps sat in the 395 ms slow episode
# (fast episode: 299 ms). The slowdown therefore hits the memory-bound share of real
# steps, not MXU compute, and matmul-normalizing throughput over-corrects (it
# implied >100% MFU). The probe is kept as a DIAGNOSTIC (MXU-health evidence per
# window); the defense against bimodality is spreading windows over minutes to
# straddle episodes (--window_spacing) and recording the best window.
CALIB_NOMINAL_MS = {"v5 lite": 332.0, "v5e": 332.0, "v5litepod": 332.0}

# Clean-state sum-of-op-durations of the HEADLINE stage-1 step (gemma3-1b, batch 8,
# remat=none, unquantized) on the recording v5e: measured 270.34 ms by the r5 op
# table, independently matching r4's clean-state module span (270.4). Used ONLY to
# label the tiled interference micro-state (ops stretched, interleave ~0) in
# chip_state — never as a correction factor.
STAGE1_OPS_NOMINAL_MS = 270.3
_CALIB_ITERS = 48
_CALIB_N = 8192


_calib_state = None


def _calibrate(repeats: int = 1) -> float:
    """Best wall-clock ms of the fixed calibration dispatch on this chip, now.
    The jitted chain + inputs are built once per process (compile excluded)."""
    global _calib_state
    import jax
    import jax.numpy as jnp

    if _calib_state is None:
        @jax.jit
        def chain(a, b):
            def body(a, _):
                a = a @ b
                # renormalize so the chain neither explodes nor gets folded away;
                # the VPU max+div is ~1e-4 of the matmul's FLOPs
                af = a.astype(jnp.float32)
                a = (af / jnp.maximum(jnp.max(jnp.abs(af)), 1e-6)).astype(jnp.bfloat16)
                return a, ()

            a, _ = jax.lax.scan(body, a, None, length=_CALIB_ITERS)
            return jnp.sum(a.astype(jnp.float32))

        key = jax.random.key(7)
        a = jax.random.normal(key, (_CALIB_N, _CALIB_N), jnp.bfloat16)
        b = jax.random.normal(jax.random.fold_in(key, 1), (_CALIB_N, _CALIB_N),
                              jnp.bfloat16)
        float(chain(a, b))  # compile + warm
        _calib_state = (chain, a, b)
    chain, a, b = _calib_state
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chain(a, b))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def _calib_release():
    """Free the pinned calibration operands (~256 MB HBM for the MXU chain, ~256 MB
    for the HBM-streaming chain) once the windows are done — stage-0/-2 run close to
    HBM capacity and should not carry them afterwards."""
    global _calib_state, _hbm_state
    _calib_state = None
    _hbm_state = None


# Clean-state streaming bandwidth of the HBM probe on the recording v5e chip
# (measured this session; theoretical peak 819 GB/s, ~81% of peak is the expected
# large-transfer efficiency). The chip's SECOND interference mode (BENCH_EXTRA_r06
# chip_state_modes) throttles HBM bandwidth — busy time inflates 270 -> 365 ms with
# zero idle gaps while the pure-MXU probe stays ~1.0, so the MXU probe alone cannot
# see it. This probe CAN: its runtime is pure HBM streaming with known byte traffic.
# health = measured/nominal; < ~0.8 marks the throttled mode machine-readably.
HBM_NOMINAL_GBPS = {"v5 lite": 664.0, "v5e": 664.0, "v5litepod": 664.0}
# ONE 8192^2 bf16 operand (128 MiB): it must exceed VMEM (~128 MiB on v5e — a pair
# of 32 MiB operands measured 6.5 TB/s, i.e. VMEM bandwidth, not HBM) yet stay at
# half the footprint of the original two-operand probe, which tipped the
# HBM-capacity-edge stage-0 bench into ResourceExhausted on-chip
_HBM_ITERS = (48, 192)
_HBM_N = 8192

_hbm_state = None


def _hbm_calibrate(repeats: int = 2):
    """Streaming bandwidth (GB/s) of a pure-copy/add chain, now — measured
    DIFFERENTIALLY: a ``lax.scan`` of ``a = a * c + d`` over ONE [8192, 8192] bf16
    carry (2 x 128 MiB of HBM traffic per iteration: read a, write a; the scalar
    multiply-add is VPU-only, ~0.5% of the chip's FLOP ceiling, and not foldable —
    the carry feeds each iteration) is dispatched at 48 and at 192 iterations, and
    bandwidth = traffic delta / time delta. The tunneled axon
    runtime adds a ~30 ms CONSTANT dispatch+readback latency that would understate
    a single absolute measurement by ~2x at probe-sized transfers; the differential
    cancels it (measured asymptote 665 GB/s = 81% of the 819 GB/s peak, matching
    the committed nominal). XLA cannot fold the chain — the carry feeds each
    iteration. Returns None off-TPU or on a nonsensical (non-positive) delta."""
    global _hbm_state
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return None
    if _hbm_state is None:
        def make(iters):
            @jax.jit
            def chain(a):
                def body(a, _):
                    # scalar mul keeps |a| bounded so the chain neither explodes
                    # nor denorms; traffic per iter = read a + write a
                    return a * jnp.bfloat16(0.999) + jnp.bfloat16(0.001), ()

                a, _ = jax.lax.scan(body, a, None, length=iters)
                return jnp.sum(a.astype(jnp.float32))

            return chain

        a = jax.random.normal(jax.random.key(11), (_HBM_N, _HBM_N), jnp.bfloat16)
        chains = tuple(make(i) for i in _HBM_ITERS)
        for c in chains:
            float(c(a))  # compile + warm
        _hbm_state = (chains, a)
    chains, a = _hbm_state
    times = []
    for c in chains:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(c(a))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    dt = times[1] - times[0]
    if dt <= 0:
        return None
    traffic_delta = (_HBM_ITERS[1] - _HBM_ITERS[0]) * 2 * _HBM_N * _HBM_N * 2
    return traffic_delta / dt / 1e9


def _hbm_nominal_gbps():
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, val in HBM_NOMINAL_GBPS.items():
        if key in kind:
            return val
    return None


def _hbm_health(gbps):
    """measured/nominal ratio, or None when either side is unavailable."""
    nominal = _hbm_nominal_gbps()
    if gbps is None or not nominal:
        return None
    return round(gbps / nominal, 3)


def _calib_nominal_ms():
    """Committed fast-state nominal for this chip kind; None = no committed nominal
    (session-best calibration is used alone, i.e. no cross-session normalization)."""
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, val in CALIB_NOMINAL_MS.items():
        if key in kind:
            return val
    return None


def _calib_record(calib_ms, hbm_gbps=None):
    """MXU + HBM health diagnostics for the window set (see CALIB_NOMINAL_MS note:
    the MXU probe does NOT track the episodic step slowdown, so it is evidence, not
    a correction factor; the HBM probe DOES track the bandwidth-throttled mode)."""
    nominal = _calib_nominal_ms()
    rec = {
        "window_calib_ms": [round(c, 1) for c in calib_ms],
        "nominal_ms": nominal,
        "mxu_health": [round(nominal / c, 3) for c in calib_ms] if nominal else None,
    }
    if hbm_gbps:
        rec["window_hbm_gbps"] = [round(g, 1) if g else None for g in hbm_gbps]
        rec["hbm_nominal_gbps"] = _hbm_nominal_gbps()
        rec["hbm_health"] = [_hbm_health(g) for g in hbm_gbps]
    return rec


def _intrinsic_probe(step, state, batch_data, n_steps: int = 4, key_base: int = 500):
    """Chip-state-free step time from a short jax.profiler trace.

    r5 RESOLUTION of the mode-2 mystery (BENCH_EXTRA_r06 chip_state_modes): in the
    "slow" state the module WALL-SPAN inflates 270 -> 365 ms with zero inter-step
    gaps, yet the same trace's "XLA Ops" line shows every one of OUR ops at its
    clean-state duration, summing to 270.3 ms — the inflation is FOREIGN WORK
    (another tenant / runtime) interleaved at op boundaries INSIDE our module
    window. That's why the single-op MXU and HBM-streaming probes always read ~1.0
    through the episode: one op = no interleaving points. The chip-state-free step
    time is therefore the SUM OF OP DURATIONS per step (``intrinsic_step_ms``);
    on a truly clean chip it matches the module span to ~0.1 ms (TPU executes ops
    back-to-back). ``module_span_ms`` keeps the old accounting (r3/r4 artifacts);
    ``interleave_ms`` = span - ops is the mode-2 signature, ~0 when clean.

    Returns ``(state, record)`` where record = {intrinsic_step_ms, module_span_ms,
    interleave_ms, preemption_gap_ms, n} or None when the backend can't trace /
    parse (CPU, missing protos) — the bench must not die on a diagnostic."""
    import glob as _glob
    import shutil
    import tempfile

    import jax

    if jax.default_backend() != "tpu":
        return state, None
    tmp = tempfile.mkdtemp(prefix="bench_trace_")
    try:
        jax.profiler.start_trace(tmp)
        try:
            for i in range(n_steps):
                out = step(state, batch_data, jax.random.key(key_base + i))
                state = out[0]
            float(out[1])  # sync inside the trace so every module lands in it
        finally:
            jax.profiler.stop_trace()
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

        events = []   # XLA Modules: (metadata_id, offset_ps, duration_ps)
        op_events = []  # XLA Ops: (offset_ps, duration_ps), same plane timebase
        for pb in _glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True):
            xs = xplane_pb2.XSpace()
            with open(pb, "rb") as f:
                xs.ParseFromString(f.read())
            for plane in xs.planes:
                if not plane.name.startswith("/device:TPU"):
                    continue
                for line in plane.lines:
                    if line.name == "XLA Modules":
                        for e in line.events:
                            events.append((e.metadata_id, e.offset_ps, e.duration_ps))
                    elif line.name == "XLA Ops":
                        for e in line.events:
                            op_events.append((e.offset_ps, e.duration_ps))
        if not events:
            return state, None
        # the train step is the module group with the largest total device time
        by_id = {}
        for mid, off, dur in events:
            by_id.setdefault(mid, []).append((off, dur))
        _, group = max(by_id.items(), key=lambda kv: sum(d for _, d in kv[1]))
        if len(group) < 2:
            return state, None
        durs_ms = sorted(d / 1e9 for _, d in group)
        module_span_ms = durs_ms[len(durs_ms) // 2]  # median module wall-span
        span_ps = (max(o + d for o, d in group) - min(o for o, _ in group))
        busy_ps = sum(d for _, d in group)
        gap_ms = max(0.0, (span_ps - busy_ps) / 1e9) / max(1, len(group) - 1)
        # sum of OUR op durations inside the step-module windows (the chip-state-free
        # accounting — foreign interleaved work is excluded because it isn't an event
        # on our process's XLA Ops line)
        windows = sorted((o, o + d) for o, d in group)
        ops_ps = 0
        for off, dur in op_events:
            for lo, hi in windows:
                if lo <= off < hi:
                    ops_ps += dur
                    break
        rec = {
            "preemption_gap_ms": round(gap_ms, 2),
            "module_span_ms": round(module_span_ms, 2),
            "n": len(group),
        }
        if ops_ps > 0:
            # min(ops-sum, span): interference only ever INFLATES either accounting
            # (r5 measured two micro-states under a pinned 364.7 ms span — one with
            # clean per-op durations summing to 270.3, one with fusion durations
            # inflated to tile the span), so the minimum over accountings and over
            # probes spread in time is the defensible program speed.
            ops_busy_ms = ops_ps / 1e9 / len(group)
            rec["ops_busy_ms"] = round(ops_busy_ms, 2)
            rec["intrinsic_step_ms"] = round(min(ops_busy_ms, module_span_ms), 2)
            rec["interleave_ms"] = round(max(0.0, module_span_ms - ops_busy_ms), 2)
        else:
            rec["intrinsic_step_ms"] = round(module_span_ms, 2)
            rec["interleave_ms"] = None
        return state, rec
    except Exception:
        return state, None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _op_table(step, state, batch_data, n_steps: int = 4, key_base: int = 700,
              top: int = 15):
    """Per-op device-time attribution from a profiler trace: aggregates the "XLA Ops"
    line by op metadata over ``n_steps`` step executions. Returns ``(state, rows)``
    where rows = [{op, ms_per_step, pct}] sorted by time — the op-level breakdown
    VERDICT r3 next-steps #2/#3 ask for (the step-piece breakdowns localize to
    fwd/bwd/update; this localizes to individual fusions)."""
    import glob as _glob
    import shutil
    import tempfile

    import jax

    if jax.default_backend() != "tpu":
        return state, None
    tmp = tempfile.mkdtemp(prefix="bench_ops_")
    try:
        jax.profiler.start_trace(tmp)
        try:
            for i in range(n_steps):
                out = step(state, batch_data, jax.random.key(key_base + i))
                state = out[0]
            float(out[1])
        finally:
            jax.profiler.stop_trace()
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
        import re as _re

        def group_key(name: str) -> str:
            """'%fusion.1465 = (f32[4,1855]{...}, bf16[...]{...}) fusion(...)' ->
            'fusion (f32[4,1855], bf16[4,1855,1152])' — aggregates the per-layer
            instances of the same computation into one row."""
            try:
                rhs = name.split(" = ", 1)[1]
                m = _re.match(r"(\(.*?\)|\S+)\s+([\w-]+)\(", rhs)
                if not m:
                    return name[:80]
                type_str = _re.sub(r"\{[^}]*\}", "", m.group(1))
                return f"{m.group(2)} {type_str}"
            except Exception:
                return name[:80]

        totals, counts = {}, {}
        grand = 0
        for pb in _glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True):
            xs = xplane_pb2.XSpace()
            with open(pb, "rb") as f:
                xs.ParseFromString(f.read())
            for plane in xs.planes:
                if not plane.name.startswith("/device:TPU"):
                    continue
                meta = {k: v.name for k, v in plane.event_metadata.items()}
                for line in plane.lines:
                    if line.name != "XLA Ops":
                        continue
                    for e in line.events:
                        key = group_key(meta.get(e.metadata_id, str(e.metadata_id)))
                        totals[key] = totals.get(key, 0) + e.duration_ps
                        counts[key] = counts.get(key, 0) + 1
                        grand += e.duration_ps
        if not totals:
            return state, None
        rows = [
            {"op": name, "ms_per_step": round(ps / 1e9 / n_steps, 2),
             "pct": round(100.0 * ps / grand, 1),
             "calls_per_step": round(counts[name] / n_steps, 1)}
            for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]
        ]
        rows.append({"op": "TOTAL(device busy)",
                     "ms_per_step": round(grand / 1e9 / n_steps, 2), "pct": 100.0})
        return state, rows
    except Exception:
        return state, None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _window_spacings(windows: int, spacing: float):
    """Sleep (seconds) before each window: 0 for the first, then doubling from
    ``spacing`` — spreads the window set over minutes so it straddles the chip's
    episodic slow/fast states instead of landing entirely inside one episode
    (r02's three back-to-back windows all caught the slow episode)."""
    if spacing <= 0:
        return [0.0] * windows
    out, s = [0.0], spacing
    while len(out) < windows:
        out.append(s)
        s = min(s * 2, 120.0)
    return out


def _timed_windows(step, state, batch_data, steps_n, *, windows=3, key_base=100,
                   dispatch="loop", calibrate=False, spacing=0.0):
    """Timing over ``windows`` repeats of ``steps_n`` steps; returns
    ``(best_elapsed, state, loss, per_window_step_ms, calib)`` where ``calib`` is
    the MXU-health diagnostic record (None unless ``calibrate=True``). ``spacing``
    spreads windows over wall-clock time (sleep doubling from ``spacing`` seconds
    before each window after the first) to straddle chip-state episodes.

    ``dispatch='loop'`` (default): per-dispatch chained loop — steps consume the
    donated state; one host readback of the loss syncs the window. This is how the
    trainers drive the chip.

    ``dispatch='scan'``: each window is ONE dispatch of a jitted ``lax.scan`` over
    ``steps_n`` steps. Built to test whether the chip's bimodal step times (identical
    programs measured 299 vs 393 ms/step minutes apart) were tunnel per-dispatch
    latency — they are NOT: scan and loop agree to 0.3 ms in both states, so the
    variance is external execution speed (another tenant / clocks) and
    best-of-windows is the only defense. Kept as a diagnostic. The batch is rolled
    along axis 0 by the iteration index inside the body: without that, the frozen
    towers' forward on a constant batch is loop-invariant and XLA's LICM could hoist
    it out of the scan, overstating throughput (without the roll the scan measures
    ~19 ms/step fast — exactly the hoisted frozen-vision forward). Falls back to the
    loop when the step doesn't expose ``__wrapped__``.

    Best-of-windows guards against episodic chip slowdowns either way."""
    import functools

    import jax
    import jax.numpy as jnp

    inner = getattr(step, "__wrapped__", None)
    if dispatch == "scan" and inner is not None:
        key = jax.random.key(key_base)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def multi(st, batch):
            def body(st, i):
                b = jax.tree_util.tree_map(lambda x: jnp.roll(x, i, axis=0), batch)
                st, loss, _ = inner(st, b, jax.random.fold_in(key, i))
                return st, loss

            st, ls = jax.lax.scan(body, st, jnp.arange(steps_n))
            return st, ls[-1]

        state, loss = multi(state, batch_data)  # compile + uncounted warm window
        float(loss)
        if calibrate:
            _calibrate()  # build+warm the calibration chain outside the windows
        times, calibs, hbms = [], [], []
        for sleep_s in _window_spacings(max(1, windows), spacing):
            if sleep_s:
                time.sleep(sleep_s)
            if calibrate:
                calibs.append(_calibrate())
                hbms.append(_hbm_calibrate())
            t0 = time.perf_counter()
            state, loss = multi(state, batch_data)
            float(loss)
            times.append(time.perf_counter() - t0)
        calib = _calib_record(calibs, hbms) if calibrate else None
        if calibrate:
            _calib_release()
        return min(times), state, loss, [t / steps_n * 1e3 for t in times], calib

    if calibrate:
        _calibrate()  # build+warm outside the windows
    times, calibs, hbms, loss, k = [], [], [], None, key_base
    for sleep_s in _window_spacings(max(1, windows), spacing):
        if sleep_s:
            time.sleep(sleep_s)
        if calibrate:
            calibs.append(_calibrate())
            hbms.append(_hbm_calibrate())
        t0 = time.perf_counter()
        for _ in range(steps_n):
            out = step(state, batch_data, jax.random.key(k))
            state, loss = out[0], out[1]
            k += 1
        float(loss)
        times.append(time.perf_counter() - t0)
    calib = _calib_record(calibs, hbms) if calibrate else None
    if calibrate:
        _calib_release()
    return min(times), state, loss, [t / steps_n * 1e3 for t in times], calib


def _run_flash_check():
    """Numerically validate the Mosaic-compiled Pallas flash kernel against the XLA
    attention path ON THIS backend at the production shape (575 visual + 512 caption =
    1087 tokens, GQA 4/1, D=256 — the Gemma3-1B attention config), fwd and grads.
    VERDICT r1 weak #3: interpret-mode CPU tests never exercise the Mosaic compile."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.ops.attention import dot_product_attention

    def reldiff(a, b):
        """max|a-b| scaled by the reference tensor's max|b| — bf16 outputs of a
        long-reduction attention have O(10-100) magnitudes, so absolute diffs alone
        are meaningless."""
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        return float(jnp.max(jnp.abs(a - b)) / jnp.maximum(jnp.max(jnp.abs(b)), 1e-9))

    def check(tag, *, b, t, hq, hkv, d, causal, masked):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, t, hq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.bfloat16)
        mask = None
        if masked:
            m = np.ones((b, t), np.int32)
            m[0, :64] = 0  # padding on one row exercises the kv-mask path
            mask = jnp.asarray(m)
        cot = jnp.asarray(rng.normal(size=(b, t, hq, d)), jnp.bfloat16)

        def make(impl):
            def loss(q, k, v):
                out = dot_product_attention(
                    q, k, v, scale=d ** -0.5, causal=causal, kv_mask=mask, impl=impl
                )
                return jnp.sum(out.astype(jnp.float32) * cot.astype(jnp.float32)), out

            return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True))

        (_, out_f), g_f = make("flash")(q, k, v)
        (_, out_x), g_x = make("xla")(q, k, v)
        return {
            f"{tag}/fwd": reldiff(out_f, out_x),
            f"{tag}/dq": reldiff(g_f[0], g_x[0]),
            f"{tag}/dk": reldiff(g_f[1], g_x[1]),
            f"{tag}/dv": reldiff(g_f[2], g_x[2]),
        }

    diffs = {}
    # decoder shape: 575 visual + 512 caption, GQA 4/1, D=256 (Gemma3-1B), causal
    diffs.update(check("llm", b=4, t=1087, hq=4, hkv=1, d=256, causal=True, masked=True))
    # vision tower shape: 576 patches, 16 heads, D=64 (ViT-L/16-384), bidirectional
    diffs.update(check("vit", b=4, t=576, hq=16, hkv=16, d=64, causal=False, masked=False))
    worst = max(diffs.values())
    import jax as _jax

    return {
        "metric": "flash_attention_max_rel_diff_vs_xla",
        "value": worst,
        "unit": "max|Δ|/max|ref| bf16 (fwd+grads; causal GQA LLM + bidirectional ViT shapes)",
        "extra": f"backend={_jax.default_backend()} diffs={diffs} pass={worst < 2e-2}",
    }


def _run_ce_check():
    """Numerically validate the Mosaic-compiled fused linear+CE kernel
    (ops/fused_ce.py) against the chunked XLA path ON THIS backend at the Stage-1
    production shape (B=8, 575 visual + 512 caption = 1087 tokens, Gemma3's 262k
    vocab), loss + hidden-grad, and record the per-call speedup. Same rationale as
    flash-check: interpret-mode CPU tests never exercise the Mosaic compile."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.train import losses

    B, T, D, V = 8, 1087, 1152, 262144
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.normal(size=(B, T, D)) * 0.5, jnp.bfloat16)
    table = jnp.asarray(rng.normal(size=(V, D)) * 0.02, jnp.bfloat16)
    labels = np.asarray(rng.integers(0, V, size=(B, T)))
    labels[:, :575] = -100  # visual-prefix ignore block
    labels = jnp.asarray(labels)

    @jax.jit
    def chunked(h, w, l):
        return jax.value_and_grad(
            lambda hh: losses.chunked_shifted_clm_loss(hh, w, l, chunk_size=256)[0]
        )(h)

    @jax.jit
    def fused(h, w, l):
        return jax.value_and_grad(
            lambda hh: losses.fused_shifted_clm_loss(hh, w, l)[0]
        )(h)

    def run(f, n=8):
        loss, grad = f(hidden, table, labels)
        float(loss)  # sync (compile + first run)
        t0 = time.perf_counter()
        outs = [f(hidden, table, labels) for _ in range(n)]
        float(outs[-1][0])  # one sync for the batch: amortizes tunnel latency
        return loss, grad, (time.perf_counter() - t0) / n * 1e3

    l_c, g_c, ms_c = run(chunked)
    l_f, g_f, ms_f = run(fused)
    loss_rel = abs(float(l_f) - float(l_c)) / abs(float(l_c))
    ga = np.asarray(g_c.astype(jnp.float32))
    gb = np.asarray(g_f.astype(jnp.float32))
    grad_rel = float(np.max(np.abs(ga - gb)) / max(np.max(np.abs(ga)), 1e-9))
    vp_rel = _vp_parity_subprocess()
    worst = max(loss_rel, grad_rel, vp_rel)
    return {
        "metric": "fused_ce_max_rel_diff_vs_chunked",
        "value": worst,
        "unit": "max rel diff bf16 (loss + dhidden; +vp TP mesh fp32)",
        "extra": (
            f"backend={jax.default_backend()} loss_rel={loss_rel:.2e} "
            f"grad_rel={grad_rel:.2e} vp_mesh_rel={vp_rel:.2e} "
            f"fused={ms_f:.1f}ms chunked={ms_c:.1f}ms "
            f"speedup={ms_c / ms_f:.2f}x pass={worst < 2e-2}"
        ),
    }


def _vp_parity_subprocess() -> float:
    """Vocab-parallel fused CE parity on a virtual (data=4, model=2) mesh — run in a
    CPU subprocess (the bench chip is a single device; the TP combine logic is
    backend-independent and the Mosaic compile is already covered by the main
    ce-check). Returns the max rel diff (loss + dhidden) vs the chunked GSPMD path."""
    import subprocess
    import sys

    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh
from projectiontrainer_tpu.train import losses

mesh = build_mesh(MeshConfig(data=4, model=2))
rng = np.random.default_rng(0)
B, T, D, V = 8, 64, 256, 2048
hidden = jax.device_put(jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32) * 0.5,
                        NamedSharding(mesh, P("data")))
table = jax.device_put(jnp.asarray(rng.normal(size=(V, D)), jnp.float32) * 0.02,
                       NamedSharding(mesh, P("model")))
labels = np.asarray(rng.integers(0, V, size=(B, T)))
labels[:, :16] = -100
labels = jax.device_put(jnp.asarray(labels), NamedSharding(mesh, P("data")))

l_c, g_c = jax.jit(jax.value_and_grad(
    lambda h: losses.chunked_shifted_clm_loss(h, table, labels, chunk_size=16)[0]))(hidden)
l_f, g_f = jax.jit(jax.value_and_grad(
    lambda h: losses.fused_shifted_clm_loss(h, table, labels, mesh=mesh)[0]))(hidden)
loss_rel = abs(float(l_f) - float(l_c)) / abs(float(l_c))
ga, gb = np.asarray(g_c), np.asarray(g_f)
grad_rel = float(np.max(np.abs(ga - gb)) / max(np.max(np.abs(ga)), 1e-9))
print(max(loss_rel, grad_rel))
"""
    # sitecustomize registers the PJRT TPU plugin at interpreter startup — BEFORE
    # the -c code's JAX_PLATFORMS line runs — and would contend for the chip the
    # parent bench holds; sanitize the env like data/feeder.py does for its workers
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.abspath(__file__)), env=env,
    )
    if out.returncode != 0:
        raise RuntimeError(f"vp parity subprocess failed:\n{out.stderr[-2000:]}")
    return float(out.stdout.strip().splitlines()[-1])


def _run_pipeline(steps_n: int, out_size: int = 384):
    """Host input-pipeline throughput: JPEG decode -> fused augment+preprocess
    (C++ runtime vs the numpy fallback) in images/sec — the host-side half of the
    images/sec/chip target (SURVEY §7.3.6: 'won or lost on host decode/augment')."""
    import io
    import time

    import numpy as np
    from PIL import Image

    from projectiontrainer_tpu.runtime import native

    rng = np.random.default_rng(0)
    blobs = []
    for i in range(16):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, size=(1024, 1024, 3), dtype=np.uint8)
        ).save(buf, format="JPEG", quality=92)
        blobs.append(buf.getvalue())

    def run(use_native: bool, n: int) -> float:
        lib = native._get_lib()
        t0 = time.perf_counter()
        for i in range(n):
            img = np.asarray(Image.open(io.BytesIO(blobs[i % len(blobs)])).convert("RGB"))
            if use_native and lib is not None:
                native.fused_preprocess(
                    np.ascontiguousarray(img), out_size, flip=bool(i % 2), zoom=1.05,
                    dx=3.0, dy=-2.0, contrast=1.1,
                )
            else:
                native._fused_fallback(img, out_size, bool(i % 2), 1.05, 3.0, -2.0, 1.1,
                                       1 / 255.0, 0.5, 0.5)
        return n / (time.perf_counter() - t0)

    def run_draft(n: int) -> float:
        """decode with JPEG DCT downscaling (data/image.load_image draft_size) + fused."""
        t0 = time.perf_counter()
        for i in range(n):
            im = Image.open(io.BytesIO(blobs[i % len(blobs)]))
            im.draft("RGB", (out_size, out_size))
            img = np.asarray(im.convert("RGB"))
            native.fused_preprocess(
                np.ascontiguousarray(img), out_size, flip=bool(i % 2), zoom=1.05,
                dx=3.0, dy=-2.0, contrast=1.1,
            )
        return n / (time.perf_counter() - t0)

    def run_procs(workers: int, n: int) -> float:
        """Process-pool feed (data/feeder.py): decode + SAMPLED augment (incl. the
        p=0.2 native elastic path) in worker processes, shared-memory handoff —
        the pod-scale path. Scaling is core-bound: on this 1-core VM expect ~flat;
        a v5e-8 host (many cores) multiplies near-linearly to cover 8-chip demand."""
        import os
        import tempfile

        from projectiontrainer_tpu.data import feeder

        tmpdir = tempfile.mkdtemp(prefix="ptt_bench_feed_")
        paths = []
        for i, blob in enumerate(blobs):
            p = os.path.join(tmpdir, f"{i}.jpg")
            with open(p, "wb") as f:
                f.write(blob)
            paths.append(p)
        pool = feeder.ProcessPixelPool(image_size=out_size, num_workers=workers,
                                       slots_per_worker=8)
        try:
            stream = pool.new_stream()

            def poll_or_die():
                r = pool.poll(stream, timeout=120)
                if r is None:
                    raise RuntimeError("feeder worker stalled: no result in 120s")
                return r

            # warm up worker imports
            for i in range(workers):
                assert pool.try_submit(stream, i, paths[0], 0) is not None
            for _ in range(workers):
                pool.release(poll_or_die()[1])
            inflight, submitted, got = 0, 0, 0
            t0 = time.perf_counter()
            while got < n:
                while submitted < n and inflight < pool.n_slots - 1:
                    slot = pool.try_submit(
                        stream, submitted, paths[submitted % len(paths)], submitted
                    )
                    if slot is None:
                        break
                    submitted += 1
                    inflight += 1
                pool.release(poll_or_die()[1])
                got += 1
                inflight -= 1
            return n / (time.perf_counter() - t0)
        finally:
            pool.close()

    n = max(steps_n * 8, 32)
    run(True, 4), run(False, 4), run_draft(4)  # warm caches
    native_ips = run(True, n)
    fallback_ips = run(False, n)
    draft_ips = run_draft(n)
    procs1_ips = run_procs(1, n)
    procs2_ips = run_procs(2, n)
    import multiprocessing as _mp

    cores = _mp.cpu_count()
    demand_8chip = 8 * 33.0  # chips x stage-0 images/sec/chip target (bench stage0)
    return {
        "metric": "host_pipeline_images_per_sec",
        "value": round(native_ips, 2),
        "unit": f"images/sec (1024px JPEG decode + fused augment+preprocess to {out_size})",
        "extra": (f"native={native_ips:.2f} numpy_fallback={fallback_ips:.2f} "
                  f"draft_decode={draft_ips:.2f} "
                  f"(speedups {native_ips / fallback_ips:.2f}x / "
                  f"{draft_ips / fallback_ips:.2f}x) "
                  f"procpool[1w]={procs1_ips:.2f} procpool[2w]={procs2_ips:.2f} "
                  f"(host cores={cores}; v5e-8 demand ~{demand_8chip:.0f} img/s needs "
                  f"~{demand_8chip / max(procs1_ips, 1e-9):.1f} workers at 1w rate) "
                  f"native_available={native.native_available()}"),
    }


def _build_stage0(batch: int, remat=False, ln: str = "xla"):
    """Stage-0 setup at the reference's production config: so400m-patch16-512 shape
    (27 layers, hidden 1152, 512px -> 1024 patches), text tower + logit_scale frozen,
    bf16 compute with fp32 vision masters. Returns (cfg, step, state, batch_data)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.models import siglip
    from projectiontrainer_tpu.train import masks, optim, steps

    attn = "flash" if jax.default_backend() == "tpu" else "xla"
    cfg = siglip.SiglipConfig(
        # flash attention with the D=72 zero-pad path: the XLA path materializes
        # ~1 GB/layer of fp32 scores at 1025 patches (measured 179ms vision fwd)
        vision=dataclasses.replace(siglip.so400m_16_512(), attn_impl=attn,
                                   norm_impl=ln),
        # siglip2-so400m text tower: same width/depth as vision, 256k multilingual
        # vocab, 64 positions
        text=siglip.TextConfig(hidden_size=1152, intermediate_size=4304, num_layers=27,
                               num_heads=16, vocab_size=256_000,
                               max_position_embeddings=64, attn_impl=attn,
                               norm_impl=ln),
    )
    rng = jax.random.key(0)
    kv, kt = jax.random.split(rng)
    # trained vision tower: fp32 masters (optimizer state); frozen text tower bf16
    params = {
        "vision": siglip.init_vision(kv, cfg.vision, jnp.float32),
        "text": siglip.init_text(kt, cfg.text, jnp.bfloat16),
        "logit_scale": jnp.asarray([np.log(10.0)], jnp.float32),
        "logit_bias": jnp.asarray([-10.0], jnp.float32),
    }
    labels = masks.stage0_labels(params, freeze_text=True, freeze_logit_scale=True)
    tx, _ = optim.single_group_optimizer(labels, 5e-5, total_steps=1000,
                                         warmup_ratio=0.1)
    loss_fn = steps.stage0_loss(cfg, remat=remat, compute_dtype=jnp.bfloat16)
    step = steps.make_train_step(loss_fn, tx, donate=True,
                                 trainable_mask=masks.bool_mask(labels))
    state = steps.init_state(params, tx)

    nprng = np.random.default_rng(0)
    image = cfg.vision.image_size
    batch_data = {
        "pixel_values": jnp.asarray(
            nprng.normal(size=(batch, image, image, 3)).astype(np.float32),
            dtype=jnp.bfloat16,
        ),
        "input_ids": jnp.asarray(
            nprng.integers(1, cfg.text.vocab_size, size=(batch, 64))
        ),
    }
    return cfg, step, state, batch_data


def _run_stage0(batch: int, steps_n: int, warmup: int, remat=False, windows: int = 3,
                dispatch: str = "loop", spacing: float = 0.0, ln: str = "xla"):
    """Stage-0 SigLIP contrastive fine-tune throughput at the reference's production
    config (Stage0/run_train_vision_encoder_stage0.sh:13-48), per-device batch 16."""
    import jax

    cfg, step, state, batch_data = _build_stage0(batch, remat=remat, ln=ln)
    flops = _step_flops(step, state, batch_data, jax.random.key(0))
    for i in range(warmup):
        state, loss, _ = step(state, batch_data, jax.random.key(i))
    float(loss)
    elapsed, state, loss, window_ms, calib = _timed_windows(
        step, state, batch_data, steps_n, windows=windows, dispatch=dispatch,
        calibrate=jax.default_backend() == "tpu", spacing=spacing,
    )
    state, intrinsic = _intrinsic_probe(step, state, batch_data)
    step_s = elapsed / steps_n
    n_chips = len(jax.devices())
    mfu = _mfu(flops, step_s, n_chips)
    out = {
        "metric": "stage0_contrastive_images_per_sec_per_chip",
        "value": round(batch / step_s / n_chips, 3),
        "unit": "images/sec/chip",
        "mfu": round(mfu, 4),
        "extra": (f"batch={batch} so400m-16-512 ln={ln} step={step_s * 1e3:.0f}ms "
                  f"mfu={mfu:.1%} loss={float(loss):.4f} remat={remat} "
                  f"windows_ms={[round(w, 1) for w in window_ms]} calib={calib} "
                  f"(frozen text tower, bf16 compute / fp32 vision masters)"),
    }
    if intrinsic:
        intr_s = intrinsic["intrinsic_step_ms"] / 1e3
        out["value_intrinsic"] = round(batch / intr_s / n_chips, 3)
        out["mfu_intrinsic"] = round(_mfu(flops, intr_s, n_chips), 4)
        out["preemption_gap_ms"] = intrinsic["preemption_gap_ms"]
    return out


def _run_cls(batch: int, steps_n: int, warmup: int, windows: int = 3,
             dispatch: str = "loop", spacing: float = 0.0):
    """BASELINE config #5 (cls_evaluate): AbnormalityClassifier training + eval
    throughput at the reference's production shape — the stage-0 so400m-16-512
    backbone with 14 abnormality query classes and the 16-head cross-attention probe
    (cls_evaluate/models.py:107-139), Unfreeze mode (backbone trains — the
    most expensive recipe), discriminative LRs (train_utils.py:219-259), softmax CE.
    Also records the forward-only eval rate (the distributed-sweep unit of work,
    run_distributed_experiments.sh:235-268)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.models import classifier as cls_model
    from projectiontrainer_tpu.models import siglip
    from projectiontrainer_tpu.train import masks, optim, steps

    attn = "flash" if jax.default_backend() == "tpu" else "xla"
    vcfg = dataclasses.replace(siglip.so400m_16_512(), attn_impl=attn)
    ccfg = cls_model.ClassifierConfig(vision=vcfg, num_classes=14, num_heads=16,
                                      dropout_rate=0.1)
    params = cls_model.init(jax.random.key(0), ccfg, jnp.float32)
    labels = masks.classifier_labels(params, freeze_vision=False)
    tx, _ = optim.discriminative_optimizer(
        labels, head_lr=1e-4, backbone_lr=1e-5, total_steps=1000, weight_decay=0.01)
    loss_fn = steps.classifier_loss(ccfg, compute_dtype=jnp.bfloat16)
    step = steps.make_train_step(loss_fn, tx, donate=True,
                                 trainable_mask=masks.bool_mask(labels))
    state = steps.init_state(params, tx)

    nprng = np.random.default_rng(0)
    image = vcfg.image_size
    batch_data = {
        "pixel_values": jnp.asarray(
            nprng.normal(size=(batch, image, image, 3)).astype(np.float32),
            dtype=jnp.bfloat16),
        "target_indices": jnp.asarray(nprng.integers(0, 14, size=(batch,))),
    }
    flops = _step_flops(step, state, batch_data, jax.random.key(0))
    for i in range(warmup):
        state, loss, _ = step(state, batch_data, jax.random.key(i))
    float(loss)
    elapsed, state, loss, window_ms, calib = _timed_windows(
        step, state, batch_data, steps_n, windows=windows, dispatch=dispatch,
        calibrate=jax.default_backend() == "tpu", spacing=spacing,
    )
    state, intrinsic = _intrinsic_probe(step, state, batch_data)
    step_s = elapsed / steps_n
    n_chips = len(jax.devices())
    mfu = _mfu(flops, step_s, n_chips)

    # forward-only eval rate (bf16 compute, no dropout): the sweep's unit of work
    eval_fn = jax.jit(lambda p, pix: cls_model.forward(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                     if jnp.issubdtype(x.dtype, jnp.floating) else x, p),
        ccfg, pix))
    logits = eval_fn(state["params"], batch_data["pixel_values"])
    np.asarray(logits)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(steps_n):
        logits = eval_fn(state["params"], batch_data["pixel_values"])
    np.asarray(logits)
    eval_rate = batch * steps_n / (time.perf_counter() - t0) / n_chips

    out = {
        "metric": "cls_train_images_per_sec_per_chip",
        "value": round(batch / step_s / n_chips, 3),
        "unit": "images/sec/chip",
        "mfu": round(mfu, 4),
        "eval_images_per_sec_per_chip": round(eval_rate, 1),
        "extra": (f"batch={batch} so400m-16-512 probe(14cls,16heads) "
                  f"step={step_s * 1e3:.0f}ms mfu={mfu:.1%} loss={float(loss):.4f} "
                  f"eval={eval_rate:.0f} img/s/chip "
                  f"windows_ms={[round(w, 1) for w in window_ms]} calib={calib} "
                  f"(Unfreeze mode, discriminative LRs, bf16 compute)"),
    }
    if intrinsic:
        intr_s = intrinsic["intrinsic_step_ms"] / 1e3
        out["value_intrinsic"] = round(batch / intr_s / n_chips, 3)
        out["mfu_intrinsic"] = round(_mfu(flops, intr_s, n_chips), 4)
        out["preemption_gap_ms"] = intrinsic["preemption_gap_ms"]
    return out


def _run_stage0_breakdown(batch: int, steps_n: int):
    """Time-attribution for the stage-0 step (VERDICT r2 weak #2: 49% MFU, no
    committed breakdown): times the full train step against its pieces — vision fwd,
    text fwd, loss fwd, fwd+bwd without the update, and the optimizer update by
    difference — each with XLA's own FLOP estimate, so per-part MFU localizes where
    the non-MXU time goes."""
    import functools

    import jax
    import jax.numpy as jnp

    from projectiontrainer_tpu.core import dtypes
    from projectiontrainer_tpu.models import siglip
    from projectiontrainer_tpu.train import steps as steps_mod

    cfg, step, state, batch_data = _build_stage0(batch)
    loss_fn = steps_mod.stage0_loss(cfg, remat=False, compute_dtype=jnp.bfloat16)

    def timed(fn, *args, n=steps_n):
        """(ms_per_call, flops): one readback sync per n calls (the tunneled
        runtime's block_until_ready returns early; a scalar float() doesn't)."""
        flops = _step_flops(fn, *args)

        def sync(o):
            leaf = jax.tree_util.tree_leaves(o)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))

        out = fn(*args)  # compile + warm
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / n * 1e3, flops

    results = {}
    peak = _peak_flops_per_chip()

    params_bf16 = jax.jit(
        functools.partial(dtypes.cast_compute_params, compute_dtype=jnp.bfloat16)
    )(state["params"])

    vision_fwd = jax.jit(lambda p, px: siglip.vision_forward(p["vision"], cfg.vision,
                                                             px))
    results["vision_fwd"] = timed(vision_fwd, params_bf16,
                                  batch_data["pixel_values"])

    text_fwd = jax.jit(lambda p, ids: siglip.text_forward(p["text"], cfg.text, ids))
    results["text_fwd"] = timed(text_fwd, params_bf16, batch_data["input_ids"])

    # free the bf16 params copy (~1.3 GB) and the tower executables before the
    # heavy fwd+bwd timing — batch-16 stage-0 runs close to HBM capacity
    import gc

    del params_bf16, vision_fwd, text_fwd
    gc.collect()

    loss_fwd = jax.jit(lambda p, b: loss_fn(p, b, None)[0])
    results["loss_fwd"] = timed(loss_fwd, state["params"], batch_data)
    del loss_fwd
    gc.collect()

    # NOTE: a standalone fwd+bwd timing is not runnable at batch 16 — returning the
    # 1.6 GB fp32 vision grads as program OUTPUTS (instead of consuming them in the
    # fused update like the real donated step) pushes past HBM (measured OOM, twice).
    # bwd+update is attributed by difference full_step - loss_fwd below.

    # the full step (loss + grads + masked AdamW update + cast bookkeeping)
    flops_full = _step_flops(step, state, batch_data, jax.random.key(0))
    state2, loss, _ = step(state, batch_data, jax.random.key(0))
    float(loss)
    t0 = time.perf_counter()
    st = state2
    for i in range(steps_n):
        st, loss, _ = step(st, batch_data, jax.random.key(i + 1))
    float(loss)
    full_ms = (time.perf_counter() - t0) / steps_n * 1e3
    results["full_step"] = (full_ms, flops_full)

    lines = {}
    for name, (ms, flops) in results.items():
        mfu = flops / (ms / 1e3) / peak if ms else 0.0
        lines[name] = {"ms": round(ms, 1), "gflop": round(flops / 1e9, 1),
                       "mfu": round(mfu, 3)}
    lines["bwd_and_update_by_difference_ms"] = round(
        results["full_step"][0] - results["loss_fwd"][0], 1)
    return {
        "metric": "stage0_step_breakdown",
        "value": lines["full_step"]["ms"],
        "unit": "ms/step (batch %d), parts in extra" % batch,
        "mfu": lines["full_step"]["mfu"],
        "extra": f"breakdown={json.dumps(lines)}",
    }


def _build_stage1(batch: int, tiny: bool, remat: bool = True, quant_method: str = "none",
                  model: str = "gemma3-1b"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.models import decoder as dec
    from projectiontrainer_tpu.models import projector as proj
    from projectiontrainer_tpu.models import siglip, vlm
    from projectiontrainer_tpu.train import masks, optim, steps

    if tiny:
        from projectiontrainer_tpu import testing as T

        cfg = T.tiny_vlm_cfg()
        caption_len = 16
        image = cfg.vision.image_size
    else:
        import dataclasses

        attn = "flash" if jax.default_backend() == "tpu" else "xla"
        vis = dataclasses.replace(siglip.vit_l_16_384(), attn_impl=attn)
        if model == "qwen3-8b":
            # the reference's stage-1 sweep trains against Qwen/Qwen3-8B too
            # (Stage1/run_projection_train_stage1.sh:12)
            llm = dec.qwen3_config(attn_impl=attn)
        else:
            llm = dec.gemma3_config(attn_impl=attn)  # 1B: 26L, hidden 1152, 262k vocab
        cfg = vlm.VLMConfig(
            vision=vis,
            projector=proj.ProjectorConfig(
                vision_dim=vis.hidden_size, llm_dim=llm.hidden_size, expansion_factor=10
            ),
            llm=llm,
        )
        caption_len = 512
        image = vis.image_size

    rng = jax.random.key(0)
    # frozen towers in bf16 (they take no optimizer state), projector fp32.
    # quant_method != none quantizes the frozen LLM — the reference ALSO QLoRA-loads
    # the frozen Stage-1 LLM in 4-bit (Stage1/train_projection_stage1.py:192-210), and
    # on TPU it halves/quarters the dominant HBM weight traffic of the frozen fwd+bwd.
    if quant_method != "none" and not tiny:
        from projectiontrainer_tpu.testing import synthetic_quantized_decoder

        llm_params = synthetic_quantized_decoder(cfg.llm, seed=2, method=quant_method)
    else:
        llm_params = dec.init(jax.random.fold_in(rng, 2), cfg.llm, jnp.bfloat16)
    params = {
        "vision": siglip.init_vision(jax.random.fold_in(rng, 0), cfg.vision, jnp.bfloat16),
        "projector": proj.init(jax.random.fold_in(rng, 1), cfg.projector, jnp.float32),
        "llm": llm_params,
    }

    labels = masks.stage1_labels(params)
    tx, _ = optim.single_group_optimizer(
        labels, 3e-5, total_steps=1000, warmup_ratio=0.05, clip_norm=5.0
    )
    loss_fn = steps.stage1_loss(cfg, 0, remat=remat, logits_chunk=256 if not tiny else None,
                                compute_dtype=jnp.bfloat16 if not tiny else None)
    step = steps.make_train_step(
        loss_fn, tx, donate=True, trainable_mask=masks.bool_mask(labels)
    )
    state = steps.init_state(params, tx)

    nprng = np.random.default_rng(0)
    batch_data = {
        "pixel_values": jnp.asarray(
            nprng.normal(size=(batch, image, image, 3)).astype(np.float32),
            dtype=jnp.bfloat16,
        ),
        "caption_ids": jnp.asarray(
            nprng.integers(1, cfg.llm.vocab_size, size=(batch, caption_len))
        ),
    }
    return step, state, batch_data


def _full_vlm_cfg(model: str = "gemma3-1b"):
    import dataclasses

    import jax

    from projectiontrainer_tpu.models import decoder as dec
    from projectiontrainer_tpu.models import projector as proj
    from projectiontrainer_tpu.models import siglip, vlm

    attn = "flash" if jax.default_backend() == "tpu" else "xla"
    vis = dataclasses.replace(siglip.vit_l_16_384(), attn_impl=attn)
    if model == "qwen3-8b":
        # Qwen/Qwen3-8B shape — the LLM the reference actually trains Stage 1/2 on
        # (Stage2/run_vqa_train_stage2.sh:19)
        llm = dec.qwen3_config(attn_impl=attn)
    else:
        llm = dec.gemma3_config(attn_impl=attn)
    return vlm.VLMConfig(
        vision=vis,
        projector=proj.ProjectorConfig(
            vision_dim=vis.hidden_size, llm_dim=llm.hidden_size, expansion_factor=10
        ),
        llm=llm,
    )


def _run_serve(batch: int, n_clients: int = 8, n_requests: int = 48,
               max_new: int = 64, beams: int = 1, quant_method: str = "none",
               max_wait_ms: float = 25.0):
    """Load-test the REAL serving stack (cli/serve.py: HTTP endpoint -> micro-batcher
    -> bucketed jitted generate) with N concurrent closed-loop clients and compare
    against the offline batch path (VERDICT r3 missing #2: the production surface had
    correctness tests but no load number). Uses the production Gemma3-1B VLM shapes
    with synthetic weights (setup.build_vlm monkeypatched — no snapshots on the bench
    box); requests carry base64 JPEGs and mixed question lengths spanning two
    q-buckets, so the server exercises per-request decode, bucket padding, straggler
    fill, and the stats endpoint. Serving-latency generation config: short answers
    (the reference VQA task is 'single word or phrase'), greedy."""
    import base64
    import io
    import json as _json
    import logging
    import threading
    import urllib.request

    import jax
    import numpy as np

    from projectiontrainer_tpu.testing import word_tokenizer
    from projectiontrainer_tpu.train import setup as setup_mod

    cfg = _full_vlm_cfg("gemma3-1b")
    params = _init_full_params(cfg, quantize=quant_method != "none",
                               quant_method=quant_method)
    base_tok = word_tokenizer()
    n_vocab = len(base_tok.get_vocab())

    class _SafeDecodeTok:
        """word_tokenizer with decode clamped into its tiny vocab — the synthetic
        262k-vocab decoder emits ids the word vocab doesn't have."""

        def __init__(self, tok):
            self._tok = tok

        def __getattr__(self, name):
            return getattr(self._tok, name)

        def __call__(self, *a, **k):
            return self._tok(*a, **k)

        def decode(self, ids, **kw):
            return self._tok.decode([int(i) % n_vocab for i in ids], **kw)

    tok = _SafeDecodeTok(base_tok)

    from projectiontrainer_tpu.cli.serve import VQAService, build_parser, make_server

    args = build_parser().parse_args([
        "--vision_model_name", "synthetic", "--llm_name", "synthetic",
        "--projector_path", "", "--img_size", str(cfg.vision.image_size),
        "--batch_size", str(batch), "--max_q_len", "64",
        "--max_new_tokens", str(max_new), "--num_beams", str(beams),
        "--max_wait_ms", str(max_wait_ms),
    ])
    orig_build, orig_tok = setup_mod.build_vlm, setup_mod.load_tokenizer
    setup_mod.build_vlm = lambda *a, **k: (cfg, params, None)
    setup_mod.load_tokenizer = lambda *a, **k: tok
    try:
        service = VQAService(args, logging.getLogger("bench-serve"))
    finally:
        setup_mod.build_vlm, setup_mod.load_tokenizer = orig_build, orig_tok
    service.warmup()  # pre-compile every (bucket, batch) program
    server = make_server(service, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]

    # one synthetic 'x-ray' JPEG, base64 (the production intake format); question
    # texts of 8 and ~48 words span the 32- and 64-token buckets
    from PIL import Image

    img = Image.fromarray(
        (np.random.default_rng(0).random((cfg.vision.image_size,) * 2 + (3,)) * 255)
        .astype(np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    img_b64 = base64.b64encode(buf.getvalue()).decode()
    q_short = "What disease is shown in this chest ?"
    q_long = " ".join(["What disease is shown in the chest x-ray ?"] * 6)

    def post(payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/vqa", data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            return _json.loads(resp.read())

    errors = []

    def client(cid: int, n: int):
        for i in range(n):
            q = q_short if (cid + i) % 3 else q_long
            try:
                post({"image": img_b64, "question": q})
            except Exception as e:  # pragma: no cover - diagnostics only
                errors.append(repr(e))

    per_client = -(-n_requests // n_clients)
    total = per_client * n_clients
    threads = [threading.Thread(target=client, args=(c, per_client))
               for c in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats = service.stats()
    service.shutdown()
    server.shutdown()
    server.server_close()

    # offline comparison: the SAME generate path driven with always-full batches
    # (the batch CLI economics — reference: Stage2/inference_vqa_stage2.py:292-469)
    from projectiontrainer_tpu.cli.infer_vqa_stage2 import generate_answers
    from projectiontrainer_tpu.data import image as I
    from projectiontrainer_tpu.generate import GenerationConfig

    pixels = np.stack([I.preprocess(np.asarray(img.convert("RGB")),
                                    cfg.vision.image_size)] * batch)
    q_ids = [base_tok(q_short, add_special_tokens=False)["input_ids"]] * batch
    gen_cfg = service.gen_cfg
    generate_answers(pixels, q_ids, cfg, params, tok, max_q_len=64, gen_cfg=gen_cfg)
    t0 = time.perf_counter()
    off_batches = 3
    for _ in range(off_batches):
        generate_answers(pixels, q_ids, cfg, params, tok, max_q_len=64,
                         gen_cfg=gen_cfg)
    offline_rps = batch * off_batches / (time.perf_counter() - t0)

    rps = total / wall
    return {
        "metric": f"serve_requests_per_sec_b{batch}",
        "value": round(rps, 2),
        "unit": "requests/sec",
        "p50_latency_s": round(stats["p50_latency_s"], 3),
        "p95_latency_s": round(stats["p95_latency_s"], 3),
        "mean_batch_fill": round(stats["mean_batch_size"], 2),
        "offline_requests_per_sec": round(offline_rps, 2),
        "extra": (f"clients={n_clients} requests={total} wall={wall:.1f}s "
                  f"batch={batch} max_new={max_new} beams={beams} "
                  f"quant={quant_method} errors={len(errors)} "
                  f"serve/offline={rps / offline_rps:.2f} stats={stats}"
                  + (f" first_error={errors[0]}" if errors else "")),
    }


def _init_full_params(cfg, *, quantize=False, quant_method="int8"):
    import jax
    import jax.numpy as jnp

    from projectiontrainer_tpu.models import decoder as dec
    from projectiontrainer_tpu.models import projector as proj
    from projectiontrainer_tpu.models import siglip

    rng = jax.random.key(0)
    if quantize:
        # synthetic int8 weights: same dtypes/shapes/compute as a real quantized load,
        # but no bf16 intermediate (a full bf16 8B decoder would OOM the chip before it
        # could be quantized) and no slow PRNG init
        from projectiontrainer_tpu.testing import synthetic_quantized_decoder

        llm_params = synthetic_quantized_decoder(cfg.llm, seed=2, method=quant_method)
    else:
        llm_params = dec.init(jax.random.fold_in(rng, 2), cfg.llm, jnp.bfloat16)
    return {
        "vision": siglip.init_vision(jax.random.fold_in(rng, 0), cfg.vision, jnp.bfloat16),
        "projector": proj.init(jax.random.fold_in(rng, 1), cfg.projector, jnp.float32),
        "llm": llm_params,
    }


def _build_stage2(batch: int, model: str = "gemma3-1b", quant_method: str = "int8",
                  lora_dropout: float | None = None, remat=True):
    """(cfg, lcfg, step, state, batch_data) for the QLoRA VQA step at the largest
    bucket (q=256, a=1024) — shared by the throughput, breakdown, and op-table modes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.train import lora as lora_mod, masks, optim, steps

    cfg = _full_vlm_cfg(model)
    lcfg = (lora_mod.LoraConfig(r=16, alpha=32) if lora_dropout is None
            else lora_mod.LoraConfig(r=16, alpha=32, dropout=lora_dropout))
    params = _init_full_params(cfg, quantize=True, quant_method=quant_method)
    params["lora"] = lora_mod.init(jax.random.key(1), cfg.llm, lcfg)
    labels = masks.stage2_labels(
        params, masks.Stage2Freeze(train_llm=False, use_lora=True, train_projector=False)
    )
    tx, _ = optim.single_group_optimizer(
        labels, 1e-5, total_steps=1000, clip_norm=1.0, clip_per_module=True
    )
    loss_fn = steps.stage2_loss(cfg, 0, lora_cfg=lcfg, remat=remat, logits_chunk=256,
                                compute_dtype=jnp.bfloat16)
    step = steps.make_train_step(
        loss_fn, tx, donate=True, trainable_mask=masks.bool_mask(labels)
    )
    state = steps.init_state(params, tx)

    nprng = np.random.default_rng(0)
    image = cfg.vision.image_size
    vocab = cfg.llm.vocab_size
    batch_data = {
        "pixel_values": jnp.asarray(
            nprng.normal(size=(batch, image, image, 3)), dtype=jnp.bfloat16
        ),
        "question_ids": jnp.asarray(nprng.integers(1, vocab, size=(batch, 256))),
        "answer_ids": jnp.asarray(nprng.integers(1, vocab, size=(batch, 1024))),
    }
    return cfg, lcfg, step, state, batch_data


def _run_stage2(batch: int, steps_n: int, warmup: int, model: str = "gemma3-1b",
                quant_method: str = "int8", lora_dropout: float | None = None,
                windows: int = 3, dispatch: str = "loop", spacing: float = 0.0,
                remat=True):
    """QLoRA VQA step at the largest bucket (q=256, a=1024) -> tokens/sec."""
    import time

    import jax
    import jax.numpy as jnp

    from projectiontrainer_tpu.train import steps

    cfg, lcfg, step, state, batch_data = _build_stage2(
        batch, model=model, quant_method=quant_method, lora_dropout=lora_dropout,
        remat=remat,
    )
    flops = _step_flops(step, state, batch_data, jax.random.key(0))
    for i in range(warmup):
        state, loss, aux = step(state, batch_data, jax.random.key(i))
    float(loss)
    elapsed, state, loss, window_ms, calib = _timed_windows(
        step, state, batch_data, steps_n, windows=windows, dispatch=dispatch,
        calibrate=jax.default_backend() == "tpu", spacing=spacing,
    )
    state, intrinsic = _intrinsic_probe(step, state, batch_data)
    total_tokens = steps_n * batch * (575 + 256 + 1024)
    mfu = _mfu(flops, elapsed / steps_n, jax.device_count())

    # eval step at the same production bucket: proves the CHUNKED eval loss fits
    # where un-chunked fp32 logits (~7.8 GB at B=4, T=1855, V=262k) would OOM
    # (VERDICT r1 weak #1)
    eval_step = steps.make_eval_step(
        steps.stage2_loss(cfg, 0, lora_cfg=lcfg, remat=False, logits_chunk=256,
                          compute_dtype=jnp.bfloat16)
    )
    eval_loss, _ = eval_step(state["params"], batch_data)
    float(eval_loss)
    t0 = time.perf_counter()
    for _ in range(3):
        eval_loss, _ = eval_step(state["params"], batch_data)
    float(eval_loss)
    eval_ms = (time.perf_counter() - t0) / 3 * 1e3

    out = {
        "metric": f"stage2_vqa_tokens_per_sec_{model}_{quant_method}",
        "value": round(total_tokens / elapsed, 1),
        "unit": "tokens/sec",
        "mfu": round(mfu, 4),
        "extra": (f"model={model} quant={quant_method} batch={batch} remat={remat} "
                  f"loss={float(loss):.3f} step={elapsed / steps_n * 1e3:.0f}ms "
                  f"windows_ms={[round(w, 1) for w in window_ms]} calib={calib} "
                  f"mfu={mfu:.1%} eval_step={eval_ms:.0f}ms (memory-safe CE, no OOM)"),
    }
    if intrinsic:
        intr_s = intrinsic["intrinsic_step_ms"] / 1e3
        out["value_intrinsic"] = round(batch * (575 + 256 + 1024) / intr_s, 1)
        out["mfu_intrinsic"] = round(_mfu(flops, intr_s, jax.device_count()), 4)
        out["preemption_gap_ms"] = intrinsic["preemption_gap_ms"]
    return out


def _run_stage2_full(batch: int, steps_n: int, warmup: int, windows: int = 3,
                     spacing: float = 0.0, remat=True):
    """FULL-JOINT stage-2: VE + projector + LLM all trainable (the reference's
    ``--train_ve_first_epoch`` epoch-0 state with QLoRA off —
    Stage2/train_vqa_stage2.py:121-134, Stage2/trainer.py:189-246) at the largest
    bucket, Gemma3-1B: the largest full-joint that fits ONE chip (BASELINE config #4's
    single-chip operating point; the 4B recipe needs the FSDP mesh layout, proven in
    dryrun_multichip). Storage dtypes match the trainer path (train/setup.py):
    bf16 towers+LLM, fp32 projector; the vocab table trains, so the chunked CE is
    mandatory (the fused kernel's table cotangent is hard zero)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.train import masks, optim, steps

    cfg = _full_vlm_cfg("gemma3-1b")
    params = _init_full_params(cfg, quantize=False)
    labels = masks.stage2_labels(
        params, masks.Stage2Freeze(train_llm=True, use_lora=False,
                                   train_projector=True, train_vision=True)
    )
    tx, _ = optim.single_group_optimizer(
        labels, 1e-5, total_steps=1000, clip_norm=1.0, clip_per_module=True
    )
    loss_fn = steps.stage2_loss(cfg, 0, remat=remat, logits_chunk=256,
                                table_frozen=False, compute_dtype=jnp.bfloat16)
    step = steps.make_train_step(
        loss_fn, tx, donate=True, trainable_mask=masks.bool_mask(labels)
    )
    state = steps.init_state(params, tx)

    nprng = np.random.default_rng(0)
    image = cfg.vision.image_size
    vocab = cfg.llm.vocab_size
    batch_data = {
        "pixel_values": jnp.asarray(
            nprng.normal(size=(batch, image, image, 3)), dtype=jnp.bfloat16
        ),
        "question_ids": jnp.asarray(nprng.integers(1, vocab, size=(batch, 256))),
        "answer_ids": jnp.asarray(nprng.integers(1, vocab, size=(batch, 1024))),
    }
    flops = _step_flops(step, state, batch_data, jax.random.key(0))
    for i in range(warmup):
        state, loss, aux = step(state, batch_data, jax.random.key(i))
    float(loss)
    elapsed, state, loss, window_ms, calib = _timed_windows(
        step, state, batch_data, steps_n, windows=windows,
        calibrate=jax.default_backend() == "tpu", spacing=spacing,
    )
    state, intrinsic = _intrinsic_probe(step, state, batch_data)
    total_tokens = steps_n * batch * (575 + 256 + 1024)
    mfu = _mfu(flops, elapsed / steps_n, jax.device_count())
    out = {
        "metric": "stage2_full_joint_tokens_per_sec_gemma3-1b",
        "value": round(total_tokens / elapsed, 1),
        "unit": "tokens/sec",
        "mfu": round(mfu, 4),
        "extra": (f"full-joint (VE+projector+LLM trainable) batch={batch} "
                  f"remat={remat} loss={float(loss):.3f} "
                  f"step={elapsed / steps_n * 1e3:.0f}ms "
                  f"windows_ms={[round(w, 1) for w in window_ms]} calib={calib} "
                  f"mfu={mfu:.1%} grad_norm={float(aux['grad_norm']):.2f}"),
    }
    if intrinsic:
        intr_s = intrinsic["intrinsic_step_ms"] / 1e3
        out["value_intrinsic"] = round(batch * (575 + 256 + 1024) / intr_s, 1)
        out["mfu_intrinsic"] = round(_mfu(flops, intr_s, jax.device_count()), 4)
        out["preemption_gap_ms"] = intrinsic["preemption_gap_ms"]
    return out


def _run_stage2_ops(batch: int, model: str = "gemma3-1b", quant_method: str = "int8",
                    remat=False):
    """Top-op device-time table for the stage-2 step (VERDICT r3 next #2: the 1B
    remat=none headline row runs 44.5% MFU with the backward unattributed)."""
    import jax

    _, _, step, state, batch_data = _build_stage2(
        batch, model=model, quant_method=quant_method, remat=remat)
    for i in range(2):
        state, loss, _ = step(state, batch_data, jax.random.key(i))
    float(loss)
    state, rows = _op_table(step, state, batch_data)
    return {
        "metric": f"stage2_op_table_{model}_{quant_method}",
        "value": rows[-1]["ms_per_step"] if rows else 0.0,
        "unit": "ms device-busy/step",
        "extra": f"batch={batch} remat={remat} top_ops={json.dumps(rows)}",
    }


def _run_stage0_ops(batch: int, ln: str = "fused"):
    """Top-op device-time table for the stage-0 step (VERDICT r3 next #3: 335 ms
    backward at ~49% MFU, never profiled op-by-op)."""
    import jax

    _, step, state, batch_data = _build_stage0(batch, ln=ln)
    for i in range(2):
        state, loss, _ = step(state, batch_data, jax.random.key(i))
    float(loss)
    state, rows = _op_table(step, state, batch_data)
    return {
        "metric": "stage0_op_table",
        "value": rows[-1]["ms_per_step"] if rows else 0.0,
        "unit": "ms device-busy/step",
        "extra": f"batch={batch} ln={ln} top_ops={json.dumps(rows)}",
    }


def _run_stage1_ops(batch: int):
    """Top-op device-time table for the stage-1 step (the driver-recorded metric)."""
    import jax

    step, state, batch_data = _build_stage1(batch, False, remat=False)
    for i in range(2):
        state, loss, _ = step(state, batch_data, jax.random.key(i))
    float(loss)
    state, rows = _op_table(step, state, batch_data)
    return {
        "metric": "stage1_op_table",
        "value": rows[-1]["ms_per_step"] if rows else 0.0,
        "unit": "ms device-busy/step",
        "extra": f"batch={batch} top_ops={json.dumps(rows)}",
    }


def _run_stage2_breakdown(batch: int, steps_n: int, model: str = "qwen3-8b",
                          quant_method: str = "int8"):
    """Time-attribution for the stage-2 QLoRA step (VERDICT r2 weak #3: 8B at 54%
    MFU with no committed breakdown): vision+projector, decoder fwd, cropped CE,
    full fwd, fwd+bwd, and the full step — each with XLA's FLOP estimate so per-part
    MFU shows where the non-MXU time goes (attention vs dequant vs CE vs update)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.models import decoder as dec
    from projectiontrainer_tpu.models import vlm
    from projectiontrainer_tpu.train import losses, lora as lora_mod, masks, optim, steps

    cfg = _full_vlm_cfg(model)
    lcfg = lora_mod.LoraConfig(r=16, alpha=32)
    params = _init_full_params(cfg, quantize=True, quant_method=quant_method)
    params["lora"] = lora_mod.init(jax.random.key(1), cfg.llm, lcfg)
    labels = masks.stage2_labels(
        params, masks.Stage2Freeze(train_llm=False, use_lora=True, train_projector=False)
    )
    tx, _ = optim.single_group_optimizer(
        labels, 1e-5, total_steps=1000, clip_norm=1.0, clip_per_module=True
    )
    loss_fn = steps.stage2_loss(cfg, 0, lora_cfg=lcfg, remat=True, logits_chunk=256,
                                compute_dtype=jnp.bfloat16)
    step = steps.make_train_step(
        loss_fn, tx, donate=True, trainable_mask=masks.bool_mask(labels)
    )
    state = steps.init_state(params, tx)

    nprng = np.random.default_rng(0)
    image = cfg.vision.image_size
    vocab = cfg.llm.vocab_size
    q_len, a_len, v_len = 256, 1024, 575
    batch_data = {
        "pixel_values": jnp.asarray(
            nprng.normal(size=(batch, image, image, 3)), dtype=jnp.bfloat16
        ),
        "question_ids": jnp.asarray(nprng.integers(1, vocab, size=(batch, q_len))),
        "answer_ids": jnp.asarray(nprng.integers(1, vocab, size=(batch, a_len))),
    }

    def timed(fn, *args, n=steps_n):
        flops = _step_flops(fn, *args)

        def sync(o):
            leaf = jax.tree_util.tree_leaves(o)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))

        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / n * 1e3, flops

    results = {}
    # 1. vision tower + projector
    vp = jax.jit(lambda p, px: vlm.visual_embeds(p, cfg, px))
    results["vision_projector_fwd"] = timed(vp, params, batch_data["pixel_values"])

    # 2. decoder forward over the full [visual; q; a] sequence (LoRA active, no
    #    dropout in this isolated timing)
    seq_len = v_len + q_len + a_len
    embeds = jnp.asarray(nprng.normal(size=(batch, seq_len, cfg.llm.hidden_size)) * 0.02,
                         jnp.bfloat16)
    mask = jnp.ones((batch, seq_len), jnp.int32)
    dfwd = jax.jit(lambda p, e, m: dec.forward(
        p["llm"], cfg.llm, inputs_embeds=e, attention_mask=m, remat=False,
        lora=p["lora"], lora_cfg=lcfg)[0])
    results["decoder_fwd"] = timed(dfwd, params, embeds, mask)

    # 3. cropped lm-head + CE alone (the suffix-crop path the step takes): hidden
    #    positions >= loss_prefix-1, fused kernel on TPU
    labels_np = np.asarray(nprng.integers(1, vocab, size=(batch, seq_len)))
    labels_np[:, : v_len + q_len] = -100
    labels_arr = jnp.asarray(labels_np)[:, v_len + q_len - 1:]
    hidden_suffix = embeds[:, v_len + q_len - 1:]
    impl = "fused" if jax.default_backend() == "tpu" else "chunked"

    def ce_only(p, h, l):
        table = dec.lm_head_table(p["llm"], cfg.llm)
        if impl == "fused":
            return losses.fused_shifted_clm_loss(h, table, l)[0]
        return losses.chunked_shifted_clm_loss(h, table, l, chunk_size=256)[0]

    results["ce_cropped_fwd"] = timed(jax.jit(ce_only), params, hidden_suffix,
                                      labels_arr)

    # 4-6. full loss fwd / fwd+bwd / full step (dropout active, as trained)
    loss_fwd = jax.jit(lambda p, b, k: loss_fn(p, b, k)[0])
    results["loss_fwd"] = timed(loss_fwd, params, batch_data, jax.random.key(9))

    def grad_fn(p, b, k):
        def f(lora):
            return loss_fn(dict(p, lora=lora), b, k)[0]
        return jax.value_and_grad(f)(p["lora"])

    results["fwd_bwd"] = timed(jax.jit(grad_fn), params, batch_data,
                               jax.random.key(9))

    flops_full = _step_flops(step, state, batch_data, jax.random.key(0))
    st, loss, _ = step(state, batch_data, jax.random.key(0))
    float(loss)
    t0 = time.perf_counter()
    for i in range(steps_n):
        st, loss, _ = step(st, batch_data, jax.random.key(i + 1))
    float(loss)
    results["full_step"] = ((time.perf_counter() - t0) / steps_n * 1e3, flops_full)

    peak = _peak_flops_per_chip()
    lines = {}
    for name, (ms, flops) in results.items():
        mfu = flops / (ms / 1e3) / peak if ms else 0.0
        lines[name] = {"ms": round(ms, 1), "gflop": round(flops / 1e9, 1),
                       "mfu": round(mfu, 3)}
    lines["bwd_by_difference_ms"] = round(
        results["fwd_bwd"][0] - results["loss_fwd"][0], 1)
    lines["optimizer_and_dispatch_by_difference_ms"] = round(
        results["full_step"][0] - results["fwd_bwd"][0], 1)
    return {
        "metric": f"stage2_step_breakdown_{model}_{quant_method}",
        "value": lines["full_step"]["ms"],
        "unit": "ms/step (batch %d, q256/a1024), parts in extra" % batch,
        "mfu": lines["full_step"]["mfu"],
        "extra": f"breakdown={json.dumps(lines)}",
    }


def _run_gen(batch: int, steps_n: int, warmup: int, max_new: int = 1024,
             approx_topk: bool = False,
             beams: int = 3, q_len: int = 256, naive_reorder: bool = False,
             quant_method: str = "none"):
    """p50 latency of [visual; question] -> generation with a static KV cache.
    Defaults are the REFERENCE inference config: max_new 1024, beams 3, q<=256
    (Stage2/run_vqa_inference_stage2.sh:18-25). ``quant_method`` runs the decode on a
    quantized base (the reference's inference also loads the 4-bit base) — decode is
    HBM-bound on weight reads, so int8/nf4 cut the dominant traffic 2-4x."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.generate import GenerationConfig, generate
    from projectiontrainer_tpu.models import vlm

    cfg = _full_vlm_cfg()
    params = _init_full_params(
        cfg, quantize=quant_method != "none", quant_method=quant_method
    )
    nprng = np.random.default_rng(0)
    image = cfg.vision.image_size
    pixels = jnp.asarray(nprng.normal(size=(batch, image, image, 3)), dtype=jnp.bfloat16)
    q_ids = jnp.asarray(nprng.integers(1, cfg.llm.vocab_size, size=(batch, q_len)))

    gcfg = GenerationConfig(
        max_new_tokens=max_new, num_beams=beams, do_sample=beams > 1,
        temperature=0.3, top_p=0.9, top_k=50,
        repetition_penalty=1.8 if beams > 1 else 1.0,
        length_penalty=1.2 if beams > 1 else 1.0, pad_token_id=0,
        approx_top_k=approx_topk,
    )

    @jax.jit
    def run(params, pixels, q_ids, key):
        visual = vlm.visual_embeds(params, cfg, pixels)
        from projectiontrainer_tpu.models import decoder as dec

        q_emb = dec.embed(params["llm"], cfg.llm, q_ids).astype(visual.dtype)
        embeds = jnp.concatenate([visual, q_emb], axis=1)
        mask = jnp.ones(embeds.shape[:2], jnp.int32)
        return generate(params["llm"], cfg.llm, embeds, mask, gcfg, key=key,
                        naive_cache_reorder=naive_reorder)

    for i in range(warmup):
        out = run(params, pixels, q_ids, jax.random.key(i))
    np.asarray(out)
    lat = []
    for i in range(steps_n):
        t0 = time.perf_counter()
        out = run(params, pixels, q_ids, jax.random.key(100 + i))
        np.asarray(out)
        lat.append((time.perf_counter() - t0) / batch)

    p50 = float(np.median(lat))
    suffix = ("_naive_reorder" if naive_reorder else "") + (
        f"_{quant_method}" if quant_method != "none" else ""
    ) + ("_approx_topk" if approx_topk else "")
    return {
        "metric": "vqa_generation_latency_p50" + suffix,
        "value": round(p50, 4),
        "unit": f"sec/sample ({max_new} new, beams {beams}, prefix 575+{q_len}, batch {batch})",
        "extra": f"tokens/sec={max_new / p50:.1f} sampling={gcfg.do_sample} quant={quant_method}",
    }


def _parse_remat(value, *, default, allow_int: bool):
    """--remat lost its argparse choices= when integers were allowed (stage0 partial
    remat); validate here with a clean error instead of a KeyError."""
    if value is None:
        return default
    named = {"full": True, "dots": "dots", "none": False}
    if value in named:
        return named[value]
    if value.isdigit():
        if allow_int:
            return int(value)
        raise SystemExit(f"--remat {value}: integer (partial) remat is not "
                         "supported by this mode")
    raise SystemExit(f"--remat must be full|dots|none{'|<int>' if allow_int else ''}, "
                     f"got {value!r}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--mode", default="stage1",
        choices=["stage0", "stage0-breakdown", "stage0-ops", "stage1", "stage1-tiny",
                 "stage1-8b", "stage1-ops", "stage2", "stage2-8b", "stage2-full",
                 "stage2-breakdown", "stage2-ops",
                 "cls", "gen", "serve", "flash-check", "ce-check", "pipeline"],
    )
    parser.add_argument("--serve_clients", type=int, default=8,
                        help="serve mode: concurrent closed-loop clients")
    parser.add_argument("--serve_requests", type=int, default=48,
                        help="serve mode: total requests across all clients")
    parser.add_argument("--batch", type=int, default=None,
                        help="per-device batch; default depends on mode (stage1 8, "
                             "stage0/cls 16, stage2 4, 8B modes 2) — an explicit "
                             "value is always honored")
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--dispatch", choices=["loop", "scan"], default="loop",
                        help="loop: per-step dispatch (how the trainers drive the "
                             "chip). scan: one lax.scan dispatch per window — a "
                             "diagnostic that proved the chip's bimodal step times "
                             "are external, not dispatch latency")
    parser.add_argument("--windows", type=int, default=None,
                        help="repeat the timed loop this many times and report the "
                             "best window (the shared tunneled chip has episodic "
                             "slow states; min-of-windows is the code's speed). "
                             "Default: 4 for the driver-recorded stage1 mode, 3 "
                             "otherwise")
    parser.add_argument("--window_spacing", type=float, default=None,
                        help="seconds to sleep before the 2nd window, doubling per "
                             "window (capped 120s) — spreads the window set over "
                             "minutes so it straddles the chip's bimodal episodes. "
                             "Default: 20 for the driver-recorded stage1 mode, 0 "
                             "otherwise")
    parser.add_argument("--remat", type=str, default=None,
                        help="'full' | 'dots' | 'none' | integer N (partial remat: "
                             "stage0 = checkpoint the first N VISION layers; stage2 "
                             "modes = the first N DECODER layers). Per-mode defaults "
                             "when omitted: stage1 'none' (22.8 img/s vs 21.4 'dots' "
                             "at batch 8), stage0 'none', stage2 'none' (1B fits HBM "
                             "un-remated: 347 vs 439 ms), stage2-8b 'full' (un-remated "
                             "OOMs; N=31 is the measured batch-2 frontier: 1318 vs "
                             "1348 ms, +2.2%%, 446 MB short of N=28)")
    parser.add_argument("--ln", choices=["xla", "fused"], default=None,
                        help="stage0: LayerNorm implementation (fused = Pallas "
                             "fwd+bwd kernel, ops/fused_layernorm.py). Default: "
                             "fused on TPU — the hf_import auto choice; measured "
                             "480 -> 473ms on the so400m step, loss unchanged")
    parser.add_argument("--img_size", type=int, default=384,
                        help="pipeline mode: output image size (stage-0 uses 512)")
    parser.add_argument("--gen_max_new", type=int, default=1024)
    parser.add_argument("--gen_beams", type=int, default=3)
    parser.add_argument("--gen_approx_topk", action="store_true",
                        help="approx_max_k candidate scan in sampled beam search")
    parser.add_argument("--gen_naive_reorder", action="store_true",
                        help="full-cache beam gather (the pre-optimization baseline)")
    parser.add_argument("--quant", type=str, default=None,
                        choices=["int8", "nf4", "nf4-mirror", "none"],
                        help="base-weight format: stage2 modes default int8, gen "
                             "defaults none (bf16); nf4 = the reference bitsandbytes "
                             "4-bit format")
    parser.add_argument("--lora_dropout", type=float, default=None,
                        help="stage2 modes: LoRA dropout override (default: the "
                             "LoraConfig default, i.e. the reference's 0.05); 0 "
                             "isolates the dropout-mask cost")
    args = parser.parse_args(argv)

    import jax

    from projectiontrainer_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    # the driver-recorded number (default mode on TPU) gets the episode-straddling
    # window schedule by default; explicit flags override
    record_mode = args.mode == "stage1" and jax.default_backend() == "tpu"
    if args.batch is None:
        # per-mode reference batch defaults; explicit --batch always wins
        args.batch = {"stage0": 16, "stage0-breakdown": 16, "stage0-ops": 16,
                      "cls": 16, "stage2": 4, "stage2-full": 4, "stage2-ops": 4,
                      "stage2-8b": 2, "stage2-breakdown": 2, "gen": 2,
                      "stage1-8b": 4}.get(args.mode, 8)
    if args.windows is None:
        args.windows = 4 if record_mode else 3
    if args.window_spacing is None:
        # sleep schedule [0, 20, 40, 80] = 140s; with ~2m20s of setup the whole run
        # stays under 5 minutes (a driver-side timeout is not impossible)
        args.window_spacing = 20.0 if record_mode else 0.0

    if args.mode in ("stage0", "stage0-breakdown", "stage0-ops", "stage1-ops",
                     "stage2", "stage2-8b", "stage2-full", "stage2-breakdown",
                     "stage2-ops", "cls", "gen", "serve", "flash-check", "ce-check",
                     "pipeline"):
        if args.mode == "stage2-ops":
            result = _run_stage2_ops(
                args.batch, quant_method=args.quant or "int8",
                remat=_parse_remat(args.remat, default=False, allow_int=False))
        elif args.mode == "stage1-ops":
            result = _run_stage1_ops(args.batch)
        elif args.mode == "stage0-ops":
            result = _run_stage0_ops(args.batch,
                                     ln=args.ln or "fused")
        elif args.mode == "serve":
            result = _run_serve(args.batch, n_clients=args.serve_clients,
                                n_requests=args.serve_requests,
                                max_new=args.gen_max_new if args.gen_max_new != 1024 else 64,
                                beams=args.gen_beams if args.gen_beams != 3 else 1,
                                quant_method=args.quant or "none")
        elif args.mode == "stage2-full":
            result = _run_stage2_full(
                args.batch, args.steps, args.warmup, windows=args.windows,
                spacing=args.window_spacing,
                # full-joint holds bf16 moments for ~1.3B params; remat keeps the
                # activation side in budget at the (256, 1024) bucket
                remat=_parse_remat(args.remat, default=True, allow_int=False))
        elif args.mode == "flash-check":
            result = _run_flash_check()
        elif args.mode == "ce-check":
            result = _run_ce_check()
        elif args.mode == "stage0-breakdown":
            result = _run_stage0_breakdown(args.batch,
                                           args.steps)
        elif args.mode == "stage2-breakdown":
            result = _run_stage2_breakdown(
                args.batch, args.steps, model="qwen3-8b",
                quant_method=args.quant or "int8")
        elif args.mode == "stage0":
            # the global --batch default (8) is stage-1's; stage-0's reference
            # per-device batch is 16. --remat full/dots enables vision-tower remat
            # (needed for batch >= 32); the stage-0 default is none.
            remat0 = _parse_remat(args.remat, default=False, allow_int=True)
            result = _run_stage0(args.batch,
                                 args.steps, args.warmup, remat=remat0,
                                 windows=args.windows, dispatch=args.dispatch,
                                 spacing=args.window_spacing,
                                 ln=args.ln or ("fused" if jax.default_backend() == "tpu" else "xla"))
        elif args.mode == "cls":
            result = _run_cls(args.batch,
                              args.steps, args.warmup, windows=args.windows,
                              dispatch=args.dispatch, spacing=args.window_spacing)
        elif args.mode == "pipeline":
            result = _run_pipeline(args.steps, out_size=args.img_size)
        elif args.mode == "gen":
            result = _run_gen(args.batch, args.steps, args.warmup,
                              max_new=args.gen_max_new, beams=args.gen_beams,
                              approx_topk=args.gen_approx_topk,
                              naive_reorder=args.gen_naive_reorder,
                              quant_method=args.quant or "none")
        else:
            model = "qwen3-8b" if args.mode == "stage2-8b" else "gemma3-1b"
            batch = args.batch
            result = _run_stage2(batch, args.steps, args.warmup, model=model,
                                 quant_method=args.quant or "int8",
                                 lora_dropout=args.lora_dropout,
                                 windows=args.windows, dispatch=args.dispatch,
                                 spacing=args.window_spacing,
                                 # 1B fits without remat (347 vs 439ms, +27% tok/s);
                                 # the 8B OOMs un-remated and keeps 'full'; an
                                 # integer N partially remats the first N DECODER
                                 # layers (memory/speed dial at the HBM frontier)
                                 remat=_parse_remat(
                                     args.remat,
                                     default=model == "qwen3-8b",
                                     allow_int=True))
        extra = result.pop("extra", "")
        result["vs_baseline"] = None
        print(json.dumps(result))
        print(f"# {extra}", file=sys.stderr)
        return

    tiny = args.mode == "stage1-tiny" or jax.default_backend() == "cpu"
    s1_model = "qwen3-8b" if args.mode == "stage1-8b" else "gemma3-1b"
    # 8B bf16 weights (16 GB) don't fit one chip; default the frozen base to int8,
    # mirroring the reference's QLoRA-load of the frozen stage-1 LLM
    s1_quant = args.quant or ("int8" if s1_model == "qwen3-8b" else "none")
    batch = args.batch if not tiny else 4

    # stage-1 fits without remat since the fused-CE/flash memory work: measured
    # 22.8 img/s (none) vs 21.4 (dots) vs ~20 (full) at batch 8 on v5e
    remat = _parse_remat(args.remat, default="none", allow_int=False)
    step, state, batch_data = _build_stage1(
        batch, tiny, remat=remat, quant_method=s1_quant, model=s1_model
    )
    flops = _step_flops(step, state, batch_data, jax.random.key(0))

    # warmup (includes compile); float() forces a device->host readback — the only
    # reliable sync on the tunneled axon runtime (block_until_ready returns early)
    for i in range(args.warmup):
        state, loss, _ = step(state, batch_data, jax.random.key(i))
    float(loss)

    # Probe device-busy step time BEFORE and AFTER the spread windows and keep the
    # MIN: the chip has TWO interference modes (r4 measurement) — idle gaps between
    # steps (r3's anatomy) which busy-time excludes, and HBM-bandwidth throttling
    # (busy 270 -> 365 ms with ZERO gaps, MXU probe ~1.0 both ways) which inflates
    # busy time too. Two probes ~140 s apart double the odds one lands in a clean
    # episode. Tiny smoke shapes skip the probe (meaningless ratios; note the axon
    # sitecustomize forces the TPU backend even under JAX_PLATFORMS=cpu).
    def _probe(state):
        """Device-busy intrinsic probe paired with an HBM-streaming reading taken in
        the same window, so each probe carries the chip-state evidence needed to
        tell mode 2 (bandwidth throttling inflates busy time with zero gaps —
        BENCH_EXTRA_r06) from a clean reading."""
        hbm = _hbm_calibrate()
        state, rec = _intrinsic_probe(step, state, batch_data)
        if rec is not None:
            rec["hbm_gbps"] = round(hbm, 1) if hbm else None
            rec["hbm_health"] = _hbm_health(hbm)
        return state, rec

    state, intr_a = (state, None) if tiny else _probe(state)
    probes = [intr_a] if intr_a else []
    best = None
    for attempt in range(3):
        elapsed, state, loss, window_ms, calib = _timed_windows(
            step, state, batch_data, args.steps, windows=args.windows,
            dispatch=args.dispatch,
            calibrate=not tiny and jax.default_backend() == "tpu",
            spacing=args.window_spacing,
        )
        if best is None or elapsed < best[0]:
            best = (elapsed, window_ms, calib)
        # Catastrophic-contention guard: a third chip state was observed where even
        # the pure-MXU probe collapses to ~0.04 (25x; step 9.9 s vs 0.37) — another
        # tenant saturating the chip. Recording that would poison the round's
        # artifact, so when the probe itself is this sick, wait and re-measure
        # (up to 2 retries), then keep the best attempt.
        if tiny or calib is None or max(calib["mxu_health"]) >= 0.5:
            break
        print(f"# MXU probe {calib['mxu_health']} — catastrophic contention; "
              f"retry {attempt + 1}/2 after 90s", file=sys.stderr)
        time.sleep(90)
    elapsed, window_ms, calib = best
    state, intr_b = (state, None) if tiny else _probe(state)
    if intr_b:
        probes.append(intr_b)

    # Mode-2 defense (VERDICT r4 task #3), r5 form: intrinsic_step_ms is now the SUM
    # OF OUR OP DURATIONS (see _intrinsic_probe) — immune to the tenant-interleave
    # mode outright, so no retry is needed for it; the probe's interleave_ms labels
    # the state machine-readably instead. The HBM-streaming reading guards the one
    # state ops-accounting can't fix: genuine bandwidth throttling would slow the
    # ops themselves (health < 0.8 — never yet observed; the 365 ms episodes all
    # measured ~1.0). If every probe reads throttled, back off past the ~10-minute
    # episode scale and re-probe (up to twice).
    def _hbm_ok(rec):
        h = rec.get("hbm_health")
        return h is None or h >= 0.8

    throttle_retries = 0
    while (probes and not any(_hbm_ok(p) for p in probes)
           and throttle_retries < 2):
        throttle_retries += 1
        print(f"# all probes HBM-throttled "
              f"({[p.get('hbm_health') for p in probes]}); backoff 360s, "
              f"re-probe {throttle_retries}/2", file=sys.stderr)
        time.sleep(360)
        state, extra_probe = _probe(state)
        if extra_probe:
            probes.append(extra_probe)
    ok_probes = [p for p in probes if _hbm_ok(p)] or probes
    chip_state = None
    if probes:
        busy = min(p["intrinsic_step_ms"] for p in ok_probes)
        if not any(_hbm_ok(p) for p in probes):
            chip_state = "hbm-throttled"
        else:
            inter = min((p.get("interleave_ms") or 0.0) for p in ok_probes)
            chip_state = "clean" if inter < 0.05 * busy else "tenant-interleaved"
        # The interleave signature has a blind spot: in the TILED micro-state the
        # per-op durations themselves stretch to fill the pinned span (interleave
        # ~0 while the program runs 1.35x slow). For the FIXED headline config we
        # know the program's clean ops-sum cross-session (270.3 ms, confirmed by
        # r4's clean-state span and r5's op table) — use it as a DIAGNOSTIC
        # label, never a correction.
        if (chip_state == "clean" and s1_model == "gemma3-1b"
                and s1_quant == "none" and not tiny and batch == 8
                and remat in ("none", False)
                and busy > 1.1 * STAGE1_OPS_NOMINAL_MS):
            chip_state = "tenant-interleaved(tiled)"
    intrinsic = min(ok_probes, key=lambda r: r["intrinsic_step_ms"], default=None)

    n_chips = jax.device_count()
    images_per_sec = batch * args.steps / elapsed
    value = images_per_sec / n_chips
    value_intrinsic = None
    value_intrinsic_module_span = None
    if intrinsic:
        value_intrinsic = round(
            batch / (intrinsic["intrinsic_step_ms"] / 1e3) / n_chips, 3
        )
        if intrinsic.get("module_span_ms"):
            value_intrinsic_module_span = round(
                batch / (intrinsic["module_span_ms"] / 1e3) / n_chips, 3
            )

    # vs_baseline prefers the chip-state-free intrinsic number when BOTH rounds carry
    # it (VERDICT r3 weak #4: wall-clock comparisons ride chip-state luck — r2's
    # "regression" to 0.944 was a slow episode, not the code)
    vs_baseline = None
    history = sorted(glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")))
    if tiny or s1_model != "gemma3-1b" or s1_quant != "none":
        history = []  # prior rounds recorded the production 1B metric; not comparable
    if history:
        try:
            with open(history[-1]) as f:
                prev = json.load(f)
            parsed = prev.get("parsed", {}) if isinstance(prev.get("parsed"), dict) else {}
            prev_intr = prev.get("value_intrinsic") or parsed.get("value_intrinsic")
            prev_acct = prev.get("accounting") or parsed.get("accounting")
            prev_value = prev.get("value") or parsed.get("value")
            # matched accounting: rounds before r5 recorded value_intrinsic from the
            # module WALL-SPAN, which the tenant-interleave mode inflates; comparing
            # the new min-ops-span number against it would claim a phantom delta.
            # Any r5+ accounting marker means the prior intrinsic is ops-derived.
            if prev_intr and prev_acct in ("ops-busy", "min-ops-span") and value_intrinsic:
                vs_baseline = value_intrinsic / float(prev_intr)
            elif prev_intr and value_intrinsic_module_span:
                vs_baseline = value_intrinsic_module_span / float(prev_intr)
            elif prev_intr and value_intrinsic:
                vs_baseline = value_intrinsic / float(prev_intr)
            elif prev_value:
                vs_baseline = value / float(prev_value)
        except Exception:
            pass

    mfu = _mfu(flops, elapsed / args.steps, n_chips)
    metric = "stage1_align_images_per_sec_per_chip"
    if tiny:
        pass  # tiny smoke runs an unquantized tiny Gemma shape — keep the base label
    elif s1_model != "gemma3-1b":
        metric += f"_{s1_model}_{s1_quant}"
    elif s1_quant != "none":
        metric += f"_{s1_quant}"
    line = {
        "metric": metric,
        "value": round(value, 3),
        "unit": "images/sec/chip",
        "vs_baseline": vs_baseline,
        "mfu": round(mfu, 4),
    }
    if intrinsic:
        line["value_intrinsic"] = value_intrinsic
        line["accounting"] = "min-ops-span"
        line["mfu_intrinsic"] = round(
            _mfu(flops, intrinsic["intrinsic_step_ms"] / 1e3, n_chips), 4)
        line["value_intrinsic_module_span"] = value_intrinsic_module_span
        line["interleave_ms"] = intrinsic.get("interleave_ms")
        line["preemption_gap_ms"] = intrinsic["preemption_gap_ms"]
        line["hbm_probe"] = {
            "per_probe_gbps": [p.get("hbm_gbps") for p in probes],
            "per_probe_health": [p.get("hbm_health") for p in probes],
            "nominal_gbps": _hbm_nominal_gbps(),
            "selected_probe_health": intrinsic.get("hbm_health"),
            "throttle_retries": throttle_retries,
        }
        line["chip_state"] = chip_state
    if calib and intrinsic:
        line["methodology"] = (
            "value/mfu are wall-clock best-of-%d spread windows (step ms %s; MXU "
            "probe %s); value_intrinsic/mfu_intrinsic take the MIN over probes "
            "of min(sum of this program's op durations, module span) per step "
            "(accounting='min-ops-span') — interference only ever INFLATES "
            "either accounting, so the min is the defensible program speed. r5 "
            "op-level tracing of the r4 'slow busy' mode found a pinned 364.7ms "
            "module span hiding two micro-states: per-op durations CLEAN and "
            "summing to 270.3ms (foreign work interleaved at op boundaries), or "
            "fusion durations inflated to tile the span; interleave_ms is the "
            "first state's signature and chip_state labels the result. The "
            "same-window HBM-streaming probe guards genuine bandwidth "
            "throttling (health<0.8: backoff 360s + re-probe, else chip_state="
            "'hbm-throttled'; all observed episodes read ~1.0). vs_baseline "
            "compares MATCHED accounting: module-span vs pre-r5 artifacts"
            % (args.windows, [round(w, 1) for w in window_ms], calib["mxu_health"])
        )
    elif calib:
        line["methodology"] = (
            "best of %d windows spread over ~%.0fs (sleep schedule %s) to improve the "
            "odds of catching the chip's fast execution episode (the step time is "
            "bimodal 1.32x, BENCH_EXTRA_r04; slow episodes can persist an hour+, so "
            "wall-clock cross-round comparisons carry chip-state luck); per-window "
            "step ms %s; MXU-health probe per window %s"
            % (args.windows,
               sum(_window_spacings(args.windows, args.window_spacing)),
               [round(s) for s in _window_spacings(args.windows, args.window_spacing)],
               [round(w, 1) for w in window_ms],
               calib["mxu_health"])
        )
    print(json.dumps(line))
    print(
        f"# mode={args.mode} tiny={tiny} batch={batch} steps={args.steps} "
        f"elapsed={elapsed:.2f}s chips={n_chips} "
        f"loss={float(loss):.4f} "
        f"step_time={elapsed / args.steps * 1e3:.1f}ms mfu={mfu:.1%} remat={args.remat or 'none'} "
        f"windows_ms={[round(w, 1) for w in window_ms]} calib={calib}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
