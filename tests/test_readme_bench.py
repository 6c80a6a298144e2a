"""
Guards that keep the README's published benchmark numbers structurally
unable to disagree with the shipped code or the measured record.

Round-4 VERDICT (third consecutive stale-numbers finding): the README table
advertised a retired serving preset and a pre-AOT warm-start number. These
tests fail the suite whenever that class of drift reappears:

1. the preset NAME in the table must equal the shipped `serving.FAST_PRESET`;
2. every number in the table must equal the values recorded in the source
   artifact the table cites (the driver BENCH_rNN.json or a committed log);
3. the cited source must be the newest committed bench record, allowing a
   lag of exactly one driver round (the driver appends BENCH_r{N}.json AFTER
   round N's final commit, so the README can never cite it in-round).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
README = REPO / "README.md"


def _bench_block() -> str:
    m = re.search(
        r"<!-- BENCH:begin -->(.*?)<!-- BENCH:end -->", README.read_text(), flags=re.S
    )
    assert m, "README.md lost its BENCH markers"
    return m.group(1)


def _cited_source() -> str:
    m = re.search(r"source: `([^`]+)`", _bench_block())
    assert m, "README bench table must cite its source artifact"
    return m.group(1)


def test_readme_preset_label_matches_shipped_preset():
    from riffusion_tpu.serving import FAST_PRESET

    shipped = f"{FAST_PRESET['scheduler']}-{FAST_PRESET['steps']}"
    # preset labels can carry grid options ("unipc_k:rho=2-16")
    m = re.search(r"\| Serving preset \(([^,]+),", _bench_block())
    assert m, "README bench table lost its serving-preset row"
    assert m.group(1) == shipped, (
        f"README advertises preset {m.group(1)!r} but the server ships {shipped!r} "
        f"(serving.FAST_PRESET); regenerate with scripts/update_readme_bench.py"
    )


def _load_record(name: str) -> dict:
    """Extract the comparable values from a bench source artifact."""
    path = REPO / name
    if not path.exists():
        pytest.skip(f"cited source {name} not committed")
    raw = path.read_text()
    if name.endswith(".json"):
        extra = (json.loads(raw).get("parsed") or {}).get("extra") or {}
        return extra
    # local stderr log: parse the same @@-style emits bench.py prints
    extra = {}
    for key, val in re.findall(r"@@(\w+)=(\S+)", raw):
        extra[key] = val
    # logs captured from stderr don't carry @@ lines; fall back to the
    # update script's regexes via its parse()
    if not extra:
        import sys

        sys.path.insert(0, str(REPO / "scripts"))
        from update_readme_bench import parse

        v = parse(raw)
        mapping = {
            "e2e_s": "LATENCY_BEST", "fast_s": "LATENCY_FAST",
            "preset_cps": "PRESET_SUSTAINED", "warmstart_s": "WARMSTART_SECONDS",
        }
        extra = {mapping[k]: v[k] for k in mapping if k in v}
    return extra


def test_readme_numbers_match_cited_record():
    block = _bench_block()
    record = _load_record(_cited_source())

    def row_number(pattern: str) -> float:
        m = re.search(pattern, block)
        assert m, f"README bench table lost the row matching {pattern!r}"
        return float(m.group(1))

    checks = [
        (r"clip end-to-end[^|]*\| \*\*([\d.]+) s\*\*", "LATENCY_BEST", 0.0005),
        (r"FAST preset[^|]*\| \*\*([\d.]+) s\*\*", "LATENCY_FAST", 0.0005),
        (r"batch 16 sustained \| \*\*([\d.]+) clips/s\*\*", "PRESET_SUSTAINED", 0.005),
        (r"warm start[^|]*\| ([\d.]+) s", "WARMSTART_SECONDS", 0.05),
    ]
    for pattern, key, tol in checks:
        if key not in record:
            continue
        got, want = row_number(pattern), float(record[key])
        assert abs(got - want) <= tol + 1e-9, (
            f"README row ({got}) disagrees with {key}={want} in {_cited_source()}; "
            "regenerate with scripts/update_readme_bench.py"
        )


def test_readme_cites_a_current_record():
    """The cited source must be the newest committed bench evidence, modulo
    the one-round driver lag (BENCH_r{N}.json is written after round N's
    final commit, so in-round READMEs cite r{N-1} or a local log)."""
    cited = _cited_source()
    driver_records = sorted(REPO.glob("BENCH_r*.json"))
    if not driver_records:
        pytest.skip("no driver bench records committed")
    newest_n = max(int(re.search(r"r(\d+)", p.name).group(1)) for p in driver_records)
    m = re.match(r"BENCH_r(\d+)\.json", cited)
    if m:
        assert int(m.group(1)) >= newest_n - 1, (
            f"README cites {cited} but BENCH_r{newest_n:02d}.json exists; regenerate"
        )
    else:
        # local log: must itself exist (checked in _load_record) and must be
        # newer than every driver record it supersedes
        path = REPO / cited
        if path.exists():
            newest_driver = max(p.stat().st_mtime for p in driver_records)
            assert path.stat().st_mtime >= newest_driver - 1.0, (
                f"README cites {cited}, which is older than the newest driver record"
            )
