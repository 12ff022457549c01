"""Cross-process determinism: corpus + oracle must not depend on
PYTHONHASHSEED (set/dict iteration order, str hashing).

A Spark job retries tasks in fresh Python workers with arbitrary hash
seeds — any seed-dependence would break task-retry determinism and the
byte-identical / exact-triple invariants.
"""

import hashlib
import json
import subprocess
import sys

_PROBE = r"""
import hashlib, json, sys
sys.path.insert(0, {repo!r})
from gaia_synth.corpus import gen_pages
from gaia_ref.oracle import run_oracle
pages = gen_pages(60)
res = run_oracle(pages)
h = hashlib.sha256()
for p in pages:
    h.update(p["url"].encode()); h.update(p["html"])
for t in sorted(map(json.dumps, map(dict, map(sorted, map(dict.items,
        res["triples"]))))):
    h.update(t.encode())
for url in sorted(res["texts"]):
    h.update(url.encode()); h.update(res["texts"][url].encode())
print(h.hexdigest())
"""


def _digest(seed: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo="/root/repo")],
        env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin"},
        capture_output=True, text=True, check=True)
    return out.stdout.strip()


def test_corpus_and_oracle_hash_seed_independent():
    assert _digest("1") == _digest("2")
