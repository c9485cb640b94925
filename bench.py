"""Benchmark: `rs predict` device throughput on 512px tiles, one chip.

Headline: the compiled fast-path predict program exactly as `rs predict`
ships it with int8 = true in the model TOML (robosat_tpu/tools/predict.py):
host-4x4-space-to-depth uint8 input, hybrid int8 forward (bf16 blocked stem,
int8 bottleneck stacks + rewritten-kernel decoder, robosat_tpu/models/int8),
fused margin head with parity-blocked uint8 output (overlap crop included;
the host writer pool interleaves). Compared against the 5,000 tiles/sec/chip
north-star target (BASELINE.json). Reference hot loop:
robosat/tools/predict.py:81-113.

Also sweeps the full batch {8,16,32} x {bf16, int8} x {fine, host-blocked}
matrix so round-over-round scaling/dtype claims are reproducible numbers;
the matrix rides in the same single JSON line under "sweep"
(ms/batch per cell) and non-headline cells use fewer repetitions.

Methodology notes for this harness: the TPU is reached through a tunnel whose
RPC round-trip dwarfs the device time of one batch, and `block_until_ready`
has been observed returning before execution completes. So: K step programs
are queued back-to-back, each carrying a genuine data dependency on the
previous step's 4-byte checksum (cannot reorder, cannot be elided), only the
final checksum is fetched (one round trip), and the marginal time between a
short and a long chain isolates pure device time per batch. Prints exactly
one JSON line.
"""

import glob
import json
import os
import time

import numpy as np

TARGET = 5000.0  # tiles/sec/chip (BASELINE.json north star)
CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_cache.json")


def _timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


def _device_watchdog(probe_timeouts=(60.0, 120.0, 180.0, 240.0)):
    """Probe jax device discovery in subprocesses with retry + backoff.

    The axon tunnel has been observed DYING mid-session (round 3: repeated
    remote-compile crashes killed the host-side relay), after which even
    jax.devices() blocks forever in the PJRT client. A hung benchmark would
    stall the driver's round-end pipeline, so probe in a killable subprocess.
    The tunnel also flaps (round-4 end: down for the driver's run, back up
    hours later), so one 180 s probe is too eager to give up: retry with
    growing timeouts over ~10 minutes total before declaring it down.
    """
    import subprocess
    import sys

    for i, timeout_s in enumerate(probe_timeouts):
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
                timeout=timeout_s,
                capture_output=True,
                text=True,
            )
            if probe.returncode == 0 and "ok" in probe.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(
            "device probe {}/{} failed (timeout {}s)".format(i + 1, len(probe_timeouts), timeout_s),
            file=sys.stderr,
            flush=True,
        )
        if i + 1 < len(probe_timeouts):
            time.sleep(15.0 * (i + 1))
    return False


def _last_good_artifact():
    """Most recent BENCH_r*.json with a non-zero value, for the fallback line."""
    best = None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
            parsed = data.get("parsed", data)
            if parsed.get("value", 0.0) > 0.0:
                best = (os.path.basename(path), parsed["value"])
        except Exception:  # noqa: BLE001 — a malformed artifact must not sink the fallback
            continue
    return best


def _emit_unreachable():
    """TPU down: emit the last in-session sweep (bench_cache.json) if one
    exists, marked `"cached": true`, so a dead tunnel still leaves auditable
    data; otherwise cite the most recent good driver artifact dynamically."""
    err = "TPU unreachable: device discovery hung (axon tunnel down)"
    if os.path.exists(CACHE_PATH):
        try:
            with open(CACHE_PATH) as f:
                payload = json.load(f)
            payload["cached"] = True
            payload["error"] = err + "; emitting last good in-session sweep (see cached_at)"
            print(json.dumps(payload))
            return
        except Exception:  # noqa: BLE001 — corrupt cache falls through to the bare line
            pass
    last = _last_good_artifact()
    if last is not None:
        err += "; last good driver artifact {} ({})".format(last[1], last[0])
    print(
        json.dumps(
            {
                "metric": "predict_tiles_per_sec_512px",
                "value": 0.0,
                "unit": "tiles/s/chip",
                "vs_baseline": 0.0,
                "error": err,
            }
        )
    )


def main():
    import sys

    if not _device_watchdog():
        _emit_unreachable()
        return

    import jax

    # Persistent compile cache: tunnel compiles run minutes; cache them.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from robosat_tpu.models import int8 as q8
    from robosat_tpu.models import unet
    from robosat_tpu.models.layers import space_to_depth4
    from robosat_tpu.ops.augment import normalize
    from robosat_tpu.ops.head import fused_prediction_head_s2d, fused_prediction_head_s2d_blocked
    from robosat_tpu.parallel.steps import _normalize_s2d4

    device = jax.devices()[0]
    params, state = unet.init(0, num_classes=2)

    overlap, tile_size = 32, 512
    side = tile_size + 2 * overlap
    headline_batch = 16  # measures ~2-3% above 8 (sweep below); both flat

    rng = np.random.default_rng(0)
    raw_fine_all = rng.integers(0, 255, (32, side, side, 3), dtype=np.uint8)

    # Quantize once, exactly like make_int8_predict_step (parallel/steps.py).
    folded = jax.jit(unet.fold)(params, state)
    raw48_cal = space_to_depth4(raw_fine_all[:8])
    amaxes = np.asarray(
        jax.jit(lambda f, r: q8.calibration_amaxes(f, _normalize_s2d4(r), blocked=True))(folded, raw48_cal)
    )
    scales = tuple(q8.scales_from_amaxes(amaxes))
    qtree = jax.device_put(jax.jit(q8.quantize_unet_folded)(folded), device)
    folded_d = jax.device_put(folded, device)

    def make_step(dtype, layout):
        """One compiled predict step variant; salt threads the dependency."""

        blocked = layout == "blocked"

        @jax.jit
        def step(tree, raw, salt):
            if blocked:
                x = (_normalize_s2d4(raw) + salt.astype(jnp.float32) * 1e-30).astype(jnp.bfloat16)
            else:
                x = (normalize(raw) + salt.astype(jnp.float32) * 1e-30).astype(jnp.bfloat16)
            if dtype == "int8_sep":
                # Fully parity-separated Pallas tail: separated dec3 kernel
                # -> separated dec4+dec5 kernel -> doubly-blocked XLA head.
                from robosat_tpu.models import qdec, qtail
                from robosat_tpu.ops.head import fused_prediction_head_s2d_blocked_sep

                cat3, s3, s4, s5 = q8.apply_features_int8_to_dec3_input(
                    tree, scales, x, compute_dtype=jnp.bfloat16, blocked=blocked
                )
                dec3_sep = qdec.parity_up_conv_separated(cat3, tree["dec3"], s3)
                feats = qtail.fused_tail_features_sep(dec3_sep, tree["dec4"], s4, tree["dec5"], s5)
                quantized = fused_prediction_head_s2d_blocked_sep(
                    feats, tree["final"]["w"], tree["final"]["b"], overlap=overlap
                )
                return jnp.sum(quantized.astype(jnp.int32))
            if dtype in ("int8_pe", "int8_pea"):
                # Pallas bottleneck kernels on the encoder (models/qenc):
                # pe = layer1 only, pea = all four stages.
                features = q8.apply_features_int8(
                    tree, scales, x, compute_dtype=jnp.bfloat16, blocked=blocked,
                    pallas_layer1="all" if dtype == "int8_pea" else True,
                )
            elif dtype in ("int8_pt", "int8_ptf"):
                from robosat_tpu.models import qtail

                dec3, s4, s5 = q8.apply_features_int8_to_dec3(
                    tree, scales, x, compute_dtype=jnp.bfloat16, blocked=blocked
                )
                if dtype == "int8_ptf":
                    quantized = qtail.fused_tail(
                        dec3, tree["dec4"], s4, tree["dec5"], s5,
                        tree["final"]["w"], tree["final"]["b"], overlap=overlap, strip_rows=8,
                    )
                    return jnp.sum(quantized.astype(jnp.int32))
                features = qtail.fused_tail_features(dec3, tree["dec4"], s4, tree["dec5"], s5, strip_rows=8)
            elif dtype == "int8":
                features = q8.apply_features_int8(tree, scales, x, compute_dtype=jnp.bfloat16, blocked=blocked)
            elif blocked:
                features = unet.apply_features_folded_s2d_from48(tree, x)
            else:
                features = unet.apply_features_folded_s2d(tree, x)
            if blocked:
                quantized = fused_prediction_head_s2d_blocked(
                    features, tree["final"]["w"], tree["final"]["b"], overlap=overlap
                )
            else:
                quantized = fused_prediction_head_s2d(
                    features, tree["final"]["w"], tree["final"]["b"], overlap=overlap
                )
            return jnp.sum(quantized.astype(jnp.int32))

        return step

    def measure(dtype, layout, batch, reps):
        tree = folded_d if dtype == "bf16" else qtree  # int8_* variants share qtree
        raw = raw_fine_all[:batch]
        if layout == "blocked":
            raw = space_to_depth4(raw)
        raw_d = jax.device_put(raw, device)
        step = make_step(dtype, layout)

        def run_chain(k):
            salt = jnp.int32(0)
            for _ in range(k):
                salt = step(tree, raw_d, salt)
            return int(salt)  # single 4-byte fetch: one tunnel round trip

        run_chain(2)  # compile + warmup
        # Pairwise marginals, MEDIAN of positive margins: latency drift
        # between a t_short batch and a t_long batch minutes apart produced
        # negative margins (clamped to absurd rates) in round 4; pairing them
        # back-to-back bounds the drift window to one chain. min() over the
        # positive margins was optimistically biased (a spike during the
        # short chain shrinks that pair's margin while staying positive and
        # min() selects exactly that draw — round-4 ADVICE), so report the
        # median with the spread alongside.
        short, long_ = 2, 12
        margins = []
        for _ in range(reps):
            t_s = _timed(run_chain, short)
            t_l = _timed(run_chain, long_)
            margins.append((t_l - t_s) / (long_ - short))
        positive = [m for m in margins if m > 0]
        if not positive:
            raise RuntimeError("all margins non-positive (tunnel drift): {}".format(margins))
        return float(np.median(positive)), (min(positive), max(positive))

    sweep = {}
    # The experimental Pallas-tail cells are opt-in (BENCH_PALLAS=1) and run
    # LAST: a remote Mosaic compile crash has been observed killing the
    # tunnel relay itself (docs/PERF.md round 3) — after which PJRT calls
    # block forever in C and would hang the driver's round-end run.
    cells = [
        (dtype, layout, batch)
        for dtype in ("int8", "bf16")
        for layout in ("blocked", "fine")
        for batch in (8, 16, 32)
    ]
    if os.environ.get("BENCH_PALLAS"):
        pallas_cells = [
            ("int8_pe", "blocked", headline_batch),
            ("int8_pea", "blocked", headline_batch),
            ("int8_pt", "blocked", headline_batch),
            ("int8_sep", "blocked", headline_batch),
            ("int8_ptf", "blocked", headline_batch),
        ]
        # Any generic truthy value (1/true/yes/all) runs every variant; a
        # comma list (e.g. BENCH_PALLAS=int8_ptf) selects specific ones. An
        # unrecognized selection is an error, not a silent empty run.
        wanted = os.environ["BENCH_PALLAS"]
        if wanted.lower() not in ("1", "true", "yes", "all"):
            names = {c[0] for c in pallas_cells}
            unknown = [n for n in wanted.split(",") if n not in names]
            if unknown:
                raise SystemExit(
                    "BENCH_PALLAS={!r}: unknown variant(s) {}; known: {}".format(
                        wanted, unknown, sorted(names)
                    )
                )
            pallas_cells = [c for c in pallas_cells if c[0] in wanted.split(",")]
        cells += pallas_cells
    for dtype, layout, batch in cells:
        key = "{}/{}/b{}".format(dtype, layout, batch)
        is_headline = dtype == "int8" and layout == "blocked" and batch == headline_batch
        try:
            per_batch, (lo, hi) = measure(dtype, layout, batch, reps=5 if is_headline else 3)
            sweep[key] = {
                "ms_per_batch": round(per_batch * 1e3, 3),
                "tiles_per_s": round(batch / per_batch, 1),
                "ms_spread": [round(lo * 1e3, 3), round(hi * 1e3, 3)],
            }
        except Exception as exc:  # noqa: BLE001 — a cell must not sink the headline
            sweep[key] = {"error": str(exc)[:160]}
        print("{}: {}".format(key, sweep[key]), file=sys.stderr, flush=True)

    # ---- Registry families beyond the flagship U-Net ----------------------
    # Each cell runs the step exactly as `rs predict` ships it for that
    # family (make_predict_step / make_int8_predict_step). Those steps take
    # no salt operand, so a thin jit wrapper scatters one output byte into
    # the next input INSIDE the same launch (jit-of-jit inlines the shipped
    # step): a genuine data dependency with ONE program launch per step.
    # Threading the byte through separate reshape/scatter launches instead
    # was measured costing ~5-8 ms per extra launch through the tunnel,
    # polluting every family cell (round-4 finding; the flagship cells'
    # in-step salt never had the problem).
    from robosat_tpu.models import get_model
    from robosat_tpu.parallel.steps import make_int8_predict_step, make_predict_step

    def measure_family(family, dtype, layout, batch, reps=5):
        model = get_model(family)
        fparams, fstate = model.init(0, num_classes=2)
        raw = raw_fine_all[:batch]
        blocked = layout == "blocked"
        if blocked:
            raw = space_to_depth4(raw)
        if dtype == "int8":
            fstep, ftree = make_int8_predict_step(
                model, fparams, fstate, raw[:8], overlap=overlap, host_s2d=blocked,
                calib_percentile=99.9,
            )
            ftree = jax.device_put(ftree, device)

            @jax.jit
            def salted_t(tree, r, salt):
                out = fstep(tree, r.at[0, 0, 0, 0].set(salt.astype(r.dtype)))
                return out.reshape(-1)[0].astype(jnp.uint8)

            def salted(r, salt):
                return salted_t(ftree, r, salt)
        else:
            fstep = make_predict_step(
                model, overlap=overlap, compute_dtype=jnp.bfloat16, fused_head=True, fold_bn=True,
                host_s2d=blocked,
            )
            fparams_d = jax.device_put(fparams, device)
            fstate_d = jax.device_put(fstate, device)

            @jax.jit
            def salted_p(p, s, r, salt):
                out = fstep(p, s, r.at[0, 0, 0, 0].set(salt.astype(r.dtype)))
                return out.reshape(-1)[0].astype(jnp.uint8)

            def salted(r, salt):
                return salted_p(fparams_d, fstate_d, r, salt)

        raw_d = jax.device_put(raw, device)

        def run_chain(k):
            salt = jnp.uint8(0)
            for _ in range(k):
                salt = salted(raw_d, salt)
            return int(salt)  # single 4-byte fetch: one tunnel round trip

        run_chain(2)
        short, long_ = 2, 12
        # Pairwise marginals, median of positive margins (same estimator and
        # rationale as measure() above).
        margins = []
        for _ in range(reps):
            t_s = _timed(run_chain, short)
            t_l = _timed(run_chain, long_)
            margins.append((t_l - t_s) / (long_ - short))
        positive = [m for m in margins if m > 0]
        if not positive:
            return {"error": "all margins non-positive (tunnel drift): {}".format(margins)}
        per_batch = float(np.median(positive))
        return {
            "ms_per_batch": round(per_batch * 1e3, 3),
            "tiles_per_s": round(batch / per_batch, 1),
            "ms_spread": [round(min(positive) * 1e3, 3), round(max(positive) * 1e3, 3)],
        }

    family_cells = [
        ("fast", "int8", "blocked", 8),
        ("fast", "int8", "blocked", headline_batch),
        ("fast", "int8", "blocked", 32),
        ("fast", "bf16", "fine", headline_batch),
        ("deeplabv3plus", "int8", "blocked", headline_batch),
        ("deeplabv3plus", "bf16", "fine", headline_batch),
        ("segformer", "int8", "blocked", headline_batch),
        ("segformer", "bf16", "fine", headline_batch),
    ]
    for family, dtype, layout, batch in family_cells:
        key = "{}/{}/{}/b{}".format(family, dtype, layout, batch)
        try:
            sweep[key] = measure_family(family, dtype, layout, batch)
        except Exception as exc:  # noqa: BLE001 — a cell must not sink the headline
            sweep[key] = {"error": str(exc)[:160]}
        print("{}: {}".format(key, sweep[key]), file=sys.stderr, flush=True)

    headline = sweep["int8/blocked/b{}".format(headline_batch)]
    per_chip = headline.get("tiles_per_s", 0.0)
    fast_cell = sweep.get("fast/int8/blocked/b{}".format(headline_batch), {})

    payload = {
        "metric": "predict_tiles_per_sec_512px",
        "value": round(per_chip, 2),
        "unit": "tiles/s/chip",
        "vs_baseline": round(per_chip / TARGET, 4),
        "fast_family_tiles_per_s": fast_cell.get("tiles_per_s"),
        "sweep": sweep,
    }
    if per_chip > 0:
        # Persist the sweep so a later run on a dead tunnel (the driver's
        # round-end run has hit this) can emit it marked "cached": true
        # instead of a bare 0.0 — see _emit_unreachable().
        try:
            with open(CACHE_PATH, "w") as f:
                json.dump(dict(payload, cached_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())), f)
        except OSError:
            pass
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
