#!/usr/bin/env python3
"""Randomized differential gate: seeded random parameters, Spark vs DuckDB.

Usage: python3 tools/fuzz.py <sfDir> <outDir> [seed] [draws]
(after `sbt "runMain graft.Fuzz <sfDir> <outDir> <seed> <draws>"`,
or pass --run to invoke sbt itself)

Reuses tools/check.py's compare: loads each <outDir>/<draw> parquet,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
sfDir tables, and compares row multisets exactly. Exits nonzero on any
mismatch — same contract as the fixed correctness gate, over a
parameter space the frozen gate never visits.
"""
import sys, subprocess, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import check

def main():
    args = [a for a in sys.argv[1:] if a != "--run"]
    run = "--run" in sys.argv
    sfdir, outdir = args[0], args[1]
    seed = args[2] if len(args) > 2 else "1"
    draws = args[3] if len(args) > 3 else "100"
    if run:
        subprocess.run(
            ["sbt", "-batch", f"runMain graft.Fuzz {sfdir} {outdir} {seed} {draws}"],
            check=True)
    sys.exit(check.main(sfdir, outdir))

if __name__ == "__main__":
    main()
