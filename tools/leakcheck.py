#!/usr/bin/env python3
"""Repo leak scanner — regenerates LEAKCHECK.json from an actual scan.

The r10 advice flagged that LEAKCHECK.json carried only a hand-bumped
round counter, so a stale artifact was indistinguishable from a fresh
0-hit run. This script IS the fresh run: it greps the sources for the
same seven detector families and stamps the output with generated_at,
the scanned commit, and the generator name, so staleness is detectable
(a commit field that doesn't match HEAD means the artifact predates the
tree it sits in).

Usage: python3 tools/leakcheck.py [round_number] [> LEAKCHECK.json]
"""
import json
import re
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# (name, compiled pattern) — generic detectors for content that must not
# appear in a public engineering repo: non-public package/host names,
# cloud bucket pointers, chat-archive links, credential material, and
# suspicious env prefixes. Patterns are intentionally broad; the
# allowlist below removes the known-benign fixtures.
DETECTORS = {
    "internal-import": re.compile(
        r"^\s*import\s+\S*\.(?:corp|internal|private)\.", re.M),
    "internal-url": re.compile(
        r"https?://[A-Za-z0-9.-]+\.(?:corp|internal|local|lan)\b"
        r"|\bgo/[a-z][a-z0-9-]{2,}\b"),
    "internal-pkg2": re.compile(
        r"^\s*package\s+\S*(?:\.corp\.|\.internal\.)", re.M),
    "internal-bucket": re.compile(r"\b(?:s3|gs|abfss?)://[A-Za-z0-9._-]+"),
    "slack-link": re.compile(
        r"[a-z0-9-]+\.slack\.com|slack\.com/archives/[A-Z0-9]+"),
    "api-key": re.compile(
        r"\bAKIA[0-9A-Z]{16}\b"
        r"|\bsk-[A-Za-z0-9]{24,}\b"
        r"|(?:api|secret)[_-]?key\s*[:=]\s*['\"][A-Za-z0-9/+=]{20,}['\"]"),
    "axon-env": re.compile(r"\b[A-Z][A-Z0-9_]*AXON[A-Z0-9_]*\b"),
}

# RFC-2606/5737 documentation names used as test fixtures, and this
# scanner's own pattern table.
ALLOW = re.compile(
    r"example\.(?:com|org|net)|\.example\b|198\.51\.100\.|203\.0\.113\.")

SCAN_GLOBS = ["src/**/*.scala", "*.md", "*.yml", "*.sbt",
              "tools/*.py", "project/*.sbt", "project/*.scala"]


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    self_path = Path(__file__).resolve()
    hits = {name: [] for name in DETECTORS}
    for pattern in SCAN_GLOBS:
        for path in sorted(ROOT.glob(pattern)):
            if path.resolve() == self_path or not path.is_file():
                continue
            try:
                text = path.read_text(errors="replace")
            except OSError:
                continue
            lines = text.splitlines()
            for name, rx in DETECTORS.items():
                for m in rx.finditer(text):
                    # allowlist the MATCHED SUBSTRING, not its whole line:
                    # a real leak sharing a line with an RFC-2606 fixture
                    # string must still be reported
                    if ALLOW.search(m.group(0)):
                        continue
                    line_no = text.count("\n", 0, m.start()) + 1
                    line = lines[line_no - 1].strip()
                    # explicit per-line opt-out for fixtures that cannot
                    # embed an RFC-2606 marker inside the matched text
                    # (r12 advice); the annotation must NAME the detector
                    # it suppresses (r13 advice) so an opt-out added for
                    # one fixture class cannot mask a different leak on
                    # the same line; it stays visible in the file for audit
                    if f"leakcheck: allow {name}" in line:
                        continue
                    rel = path.relative_to(ROOT)
                    hits[name].append(f"{rel}:{line_no}: {line[:120]}")
    commit = subprocess.run(
        ["git", "-C", str(ROOT), "rev-parse", "HEAD"],
        capture_output=True, text=True).stdout.strip() or "unknown"
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "generated_at": datetime.now(timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "commit": commit,
        "generator": "tools/leakcheck.py",
    }
    print(json.dumps(out, indent=2))
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
