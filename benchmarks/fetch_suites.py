"""Acquire the real benchmark suites (Netlib LP, Maros-Mészáros QP) and
define the concrete exclusion lists.

Equivalent of the reference's `fetch_netlib()` / `fetch_mm()` calls and
`scripts/excluded_problems.jl:1-17` (the names below mirror that list so
runs are comparable; they are data, not code).  This environment has no
network egress, so the fetch degrades gracefully: it tries each mirror
with a short timeout and, on failure, prints where to place a manually
downloaded tarball.  Once a directory of SIF/MPS files exists, run:

    python benchmarks/run_suite.py --dir <dest>/netlib --exclude-preset netlib
    python benchmarks/run_suite.py --dir <dest>/mm     --exclude-preset mm

which is the reference protocol (scripts/benchmarks_cpu.jl:66-76).
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import urllib.request

# Reference scripts/excluded_problems.jl:1 — Netlib LPs excluded from the
# headline tables (reader quirks / pathological scaling in the original
# study).  Stored WITHOUT the .SIF suffix; run_suite matches basenames.
EXCLUDED_NETLIB = ["BLEND", "DFL001", "FORPLAN", "GFRD-PNC", "SIERRA"]

# Reference scripts/excluded_problems.jl:3 — Maros-Mészáros QPs excluded.
EXCLUDED_MM = ["EXDATA", "QFORPLAN", "QGFRDXPN", "VALUES"]

EXCLUSIONS = {"netlib": EXCLUDED_NETLIB, "mm": EXCLUDED_MM, "": []}

# Mirrors used by the Julia QPSReader artifact system (the reference's
# fetch_netlib/fetch_mm) plus the classic ftp site.
MIRRORS = {
    "netlib": [
        "https://bitbucket.org/optrove/netlib-lp/get/master.tar.gz",
        "https://ftp.numerical.rl.ac.uk/pub/cuter/netlib.tar.gz",
    ],
    "mm": [
        "https://bitbucket.org/optrove/maros-meszaros/get/master.tar.gz",
        "https://ftp.numerical.rl.ac.uk/pub/cuter/marosmeszaros.tar.gz",
    ],
}


def fetch(suite: str, dest: str, timeout: float = 20.0) -> str | None:
    """Download + extract one suite; returns the directory or None."""
    outdir = os.path.join(dest, suite)
    if os.path.isdir(outdir) and any(
        f.upper().endswith((".SIF", ".MPS", ".QPS"))
        for f in os.listdir(outdir)
    ):
        print(f"# {suite}: already present at {outdir}")
        return outdir
    os.makedirs(dest, exist_ok=True)
    tarball = os.path.join(dest, f"{suite}.tar.gz")
    if not os.path.exists(tarball):
        for url in MIRRORS[suite]:
            try:
                print(f"# trying {url}")
                urllib.request.urlretrieve(url, tarball)
                break
            except Exception as e:
                print(f"#   failed: {e}")
        else:
            print(
                f"# no mirror reachable (offline environment?).\n"
                f"# Manual path: download any {suite} SIF collection and "
                f"either place the tarball at {tarball} or extract the "
                f"SIF files into {outdir}/",
                file=sys.stderr,
            )
            return None
    os.makedirs(outdir, exist_ok=True)
    with tarfile.open(tarball) as tf:  # flatten: SIF files only
        for member in tf.getmembers():
            base = os.path.basename(member.name)
            if base.upper().endswith((".SIF", ".MPS", ".QPS")):
                member.name = base
                tf.extract(member, outdir)
    n = len(os.listdir(outdir))
    print(f"# {suite}: {n} files in {outdir}")
    return outdir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default=os.path.expanduser("~/suites"))
    ap.add_argument("--suite", choices=["netlib", "mm", "all"], default="all")
    ap.add_argument("--list-exclusions", action="store_true")
    args = ap.parse_args()
    if args.list_exclusions:
        for k in ("netlib", "mm"):
            print(f"{k}: {' '.join(EXCLUSIONS[k])}")
        return
    suites = ["netlib", "mm"] if args.suite == "all" else [args.suite]
    got = [fetch(s, args.dest) for s in suites]
    if not any(got):
        sys.exit(1)


if __name__ == "__main__":
    main()
