"""Per-round TPU validation artifact (VERDICT r2 item 5).

Runs the full evidence suite on hardware and writes ONE committed JSON:
  * full-image golden parity (800x600 depth-15 render vs the reference's
    committed out/scene.png, /root/reference/raypng.c:100)
  * the staged benchmark rows (benchmarks/stages.py, configs 1-6)
  * the invrender recovery (param error before -> after)
  * the headline bench.py line

    python scripts/validate.py [--round 3] [--skip-stages] [--quick]

Every number in the output is machine-produced in this run — BASELINE.md
prose cites this file rather than the other way round.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_golden():
    import jax
    import numpy as np

    from tpuray.camera import Camera, perspective_basis
    from tpuray.config import (GOLDEN_CAMERA_FOCAL, GOLDEN_CAMERA_FOV,
                               GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                               RenderConfig)
    from tpuray.io import GOLDEN_PNG, image_diff_stats, read_png
    from tpuray.kernels.trace import quantize_image
    from tpuray.render import render_from_basis_checked
    from tpuray.sceneio import load_scene
    from tpuray.textures import load_default_assets

    scene = load_scene("/root/reference/scenes/render.map").to_scene()
    assets = load_default_assets()
    cfg = RenderConfig(width=800, height=600, max_depth=15, chunk_size=0)
    basis = perspective_basis(
        Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR,
               GOLDEN_CAMERA_FOV, GOLDEN_CAMERA_FOCAL), 800, 600)
    rgb, info = render_from_basis_checked(scene, assets, basis, cfg)
    img = np.asarray(jax.device_get(
        quantize_image(rgb.reshape(-1, 3), 800, 600)))
    s = image_diff_stats(img, read_png(GOLDEN_PNG))
    return {
        "config": "800x600_depth15_vs_reference_golden",
        "backend": jax.default_backend(),
        "engine": "pallas", "event_retries": info["retries"],
        "mean_abs": round(s.mean_abs, 3), "max_abs": s.max_abs,
        "frac_within_1": round(s.frac_within_1, 4),
        "frac_within_8": round(s.frac_within_8, 4),
        "psnr_db": round(s.psnr, 1),
    }


def run_stages(stages):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "stages.py"),
         "--stages", stages],
        capture_output=True, text=True, timeout=3600, cwd=REPO)
    rows = []
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            rows.append(json.loads(line))
    if not rows:
        raise RuntimeError(f"stages produced no rows:\n{out.stdout}\n"
                           f"{out.stderr[-2000:]}")
    return rows


def run_invrender():
    from tpuray.apps.invrender import main as inv_main
    err0, err1, obs0, obs1 = inv_main(
        ["--steps", "200", "--width", "128", "--height", "96",
         "--lr", "3e-2", "--light-lr-scale", "1.0",
         "--checkpoint", "/tmp/validate_inv.npz"])
    # recovered_frac is measured on the OBSERVABLE parameterization
    # (rgb*ambient product etc., invrender.observable_error): the raw
    # (rgb, ambient) pair has a gauge freedom — at loss ~5e-5 the raw
    # residual is null-space motion, not unrecovered structure
    return {"config": "128x96_depth3_200steps",
            "param_err_start": round(float(err0), 4),
            "param_err_end": round(float(err1), 4),
            "observable_err_start": round(float(obs0), 4),
            "observable_err_end": round(float(obs1), 4),
            "recovered_frac": round(1.0 - float(obs1) / max(float(obs0),
                                                            1e-9), 4)}


def run_replay():
    """Replay-VJP loss+grad rows: the BASELINE 512x384 d3 config and the
    depth-15 deep-trace config (VERDICT r4 item 7 — the backward cost at
    Krec=48 must be measured, not assumed; 512x384 keeps the d15 record
    HLO under the compile relay's response limits, and the Krec scaling
    is what the row is for)."""
    rows = []
    for argv in (["3", "--json"], ["15", "--json"]):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "profile_replay.py")] + argv,
            capture_output=True, text=True, timeout=3600, cwd=REPO)
        got = [json.loads(l) for l in out.stdout.splitlines()
               if l.strip().startswith("{")]
        if not got:
            raise RuntimeError(f"profile_replay {argv} produced no rows:"
                               f"\n{out.stdout}\n{out.stderr[-2000:]}")
        rows.extend(got)
    return rows


def run_bench():
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=1200,
                         cwd=REPO)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench produced no JSON:\n{out.stdout}\n"
                       f"{out.stderr[-2000:]}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--stages", default="1,2,3,4,5,6")
    ap.add_argument("--skip-stages", action="store_true")
    ap.add_argument("--skip-invrender", action="store_true")
    ap.add_argument("--skip-replay", action="store_true")
    args = ap.parse_args(argv)
    out_path = args.out or os.path.join(REPO,
                                        f"RESULTS_r{args.round}.json")

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    results = {"round": args.round, "timestamp": int(time.time())}

    print("== golden parity ==", flush=True)
    results["golden"] = run_golden()
    print(json.dumps(results["golden"]), flush=True)

    if not args.skip_stages:
        print("== stages ==", flush=True)
        results["stages"] = run_stages(args.stages)
        for r in results["stages"]:
            print(json.dumps(r), flush=True)

    if not args.skip_invrender:
        print("== invrender recovery ==", flush=True)
        results["invrender"] = run_invrender()
        print(json.dumps(results["invrender"]), flush=True)

    if not args.skip_replay:
        print("== replay VJP ==", flush=True)
        results["replay"] = run_replay()
        for r in results["replay"]:
            print(json.dumps(r), flush=True)

    print("== headline bench ==", flush=True)
    results["bench"] = run_bench()
    print(json.dumps(results["bench"]), flush=True)

    ok = bool(results["golden"]["psnr_db"] >= 45.0)
    results["golden_gate_psnr45"] = ok

    def py(o):
        """json.dump default: numpy scalars -> python scalars."""
        if hasattr(o, "item"):
            return o.item()
        raise TypeError(f"not JSON serializable: {type(o)}")

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, default=py)
    print(f"wrote {out_path}  (golden gate >=45dB: {ok})")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
