"""Cross-host libm contract probe (PARITY open item #4, r10).

The repo's exact-compare oracle discipline routes every ln through
``functions/exactmath.py::ln_libm`` — Python's ``math.log``, i.e. the
HOST's libm — because DuckDB's ``ln`` calls the same library, so both
sides of the gate round identically (measured r10: the JVM's
``Math.log`` disagrees on ~4.4% of arguments; numpy's SIMD path on
~22%).

That contract is HOST-SCOPED. If oracle artifacts generated on
machine A are ever compared against Spark results from machine B, a
libm difference between the two hosts would surface as mysterious
hash mismatches. This tool makes that failure mode DETECTABLE instead
of silent: it fingerprints the host libm's ``ln`` over a fixed
deterministic hostile-argument sample (the same seed as
``tests/test_retrieval.py::test_ln_libm_matches_libm_and_duckdb``,
plus the measured JVM-disagreement arguments) and writes/checks
``LIBM_FINGERPRINT.json`` next to the oracle artifacts.

Usage:
    python tools/libm_fingerprint.py            # write/refresh + verify
    python tools/libm_fingerprint.py --check    # verify only (exit 1
                                                #  on mismatch/missing)

A future cross-machine run compares fingerprints FIRST: equal digests
mean the two hosts' libms agree bitwise on the sample (so exact
compares are meaningful); unequal digests mean regenerate the oracle
artifacts locally rather than chasing per-query hash noise.

The probe also cross-checks DuckDB's ``ln`` against ``math.log`` on
the same sample — the intra-host half of the contract the test suite
pins — so the artifact records both facts about this host.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import platform
import random
import struct
import sys
from pathlib import Path

ARTIFACT = Path(__file__).resolve().parent.parent / "LIBM_FINGERPRINT.json"

# the measured JVM-vs-libm disagreement arguments from the r10 audit
# (kept verbatim so every fingerprint covers the known-hostile class)
_HOSTILE = [74 / 55890.0, 21 / 55890.0, 7 / 3553.0]
_SEED = 7
_N_PER_BAND = 2000


def _sample() -> list[float]:
    rng = random.Random(_SEED)
    return (
        list(_HOSTILE)
        + [rng.uniform(1e-9, 1.0) for _ in range(_N_PER_BAND)]
        + [rng.uniform(1.0, 1e6) for _ in range(_N_PER_BAND)]
    )


def _digest(values: list[float]) -> str:
    h = hashlib.sha256()
    for v in values:
        h.update(struct.pack("<d", v))
    return h.hexdigest()


def fingerprint() -> dict:
    args = _sample()
    lns = [math.log(a) for a in args]
    out = {
        "sample": {
            "seed": _SEED,
            "n": len(args),
            "hostile_args": _HOSTILE,
            "args_digest": _digest(args),
        },
        "ln_digest": _digest(lns),
        "host": {
            "platform": platform.platform(),
            "libc": "".join(platform.libc_ver()),
            "python": platform.python_version(),
        },
    }
    try:
        import duckdb

        con = duckdb.connect()
        dk = [
            r[0]
            for r in con.execute(
                "SELECT ln(x) FROM (SELECT unnest(?) AS x)", [args]
            ).fetchall()
        ]
        out["duckdb_ln_digest"] = _digest(dk)
        out["duckdb_matches_libm"] = dk == lns
    except ImportError:  # pragma: no cover - duckdb is baked in here
        out["duckdb_ln_digest"] = None
        out["duckdb_matches_libm"] = None
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--check",
        action="store_true",
        help="verify the recorded fingerprint matches this host "
        "(exit 1 on mismatch or missing artifact); default is "
        "write/refresh then verify",
    )
    ns = ap.parse_args()

    fp = fingerprint()
    if fp.get("duckdb_matches_libm") is False:
        print(
            "FAIL: this host's DuckDB ln disagrees with math.log — the "
            "intra-host oracle contract itself is broken here",
            file=sys.stderr,
        )
        return 1

    if ns.check:
        if not ARTIFACT.exists():
            print(f"FAIL: {ARTIFACT.name} missing — run without --check")
            return 1
        rec = json.loads(ARTIFACT.read_text())
        keys = ("ln_digest", "duckdb_ln_digest")
        same = all(rec.get(k) == fp.get(k) for k in keys)
        if not same:
            print(
                "FAIL: host libm fingerprint differs from the recorded "
                f"one ({ARTIFACT.name}) — oracle artifacts from the "
                "recording host are NOT exact-comparable here; "
                "regenerate them locally",
            )
            for k in keys:
                print(f"  {k}: recorded={rec.get(k)} here={fp.get(k)}")
            return 1
        print(
            f"OK: libm fingerprint matches {ARTIFACT.name} "
            f"(ln_digest={fp['ln_digest'][:16]}..., duckdb agrees bitwise)"
        )
        return 0

    ARTIFACT.write_text(json.dumps(fp, indent=2) + "\n")
    print(
        f"wrote {ARTIFACT.name}: ln_digest={fp['ln_digest'][:16]}..., "
        f"duckdb_matches_libm={fp['duckdb_matches_libm']}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
