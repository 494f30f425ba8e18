"""At-scale real-sequence end-to-end validation (VERDICT round 1, missing #3).

Synthesizes a corpus of N real FASTA genomes derived from the reference's
influenza-A test set (mutate / concatenate - planted similarity clusters,
occasional N runs to exercise scanner resets), including a handful of
multi-megabase genomes that exercise the chunked k-1-overlap build path
(models/bank.sketch_codes_device), then runs the FULL pipeline:

    gzipped FASTA  ->  build_bank_from_files (device sketch construction)
                   ->  write_sketch_files / from_sketch_files roundtrip
                   ->  select_pairs (flagship screened engine)
                   ->  EXACT match (pair set + 6-decimal Jaccard strings)
                       vs the sequential scalar host reference
                       (utils/hostref.select_pairs_host)

and records build / select wall-clock. Protocol mirrors the reference's
golden flow (results.txt + run_comparison_experiment.sh:93-110) at a scale
the reference never shipped a harness for.

Usage:  python experiments/validate_real_scale.py [--n 2048] [--tau 0.9]
        [--criterion smh_a] [--big 6] [--workdir /tmp/csc_realscale]
"""

import argparse
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"
BASES = np.frombuffer(b"ACGT", np.uint8)


def load_influenza_seqs():
    files = [
        os.path.join(REFERENCE, line.strip())
        for line in open(os.path.join(REFERENCE, "test_influeza_filelist.txt"))
        if line.strip()
    ]
    seqs = []
    for f in files:
        parts = []
        with gzip.open(f, "rb") as fh:
            for line in fh:
                if not line.startswith(b">"):
                    parts.append(line.strip())
        seqs.append(np.frombuffer(b"".join(parts).upper(), np.uint8))
    return seqs


def mutate(seq, rate, rng):
    """Substitution mutations at `rate`, plus a few planted N runs."""
    seq = seq.copy()
    k = rng.binomial(seq.size, rate)
    if k:
        pos = rng.choice(seq.size, size=k, replace=False)
        seq[pos] = BASES[rng.integers(0, 4, k)]
    # ~1 N-run per 50 kb: exercises the scanner's window reset.
    for _ in range(max(1, seq.size // 50_000)):
        if rng.random() < 0.5:
            start = int(rng.integers(0, max(1, seq.size - 30)))
            seq[start : start + int(rng.integers(1, 30))] = ord("N")
    return seq


def write_fasta_gz(path, name, seq):
    with gzip.open(path, "wb", compresslevel=1) as fh:
        fh.write(b">" + name.encode() + b"\n")
        for i in range(0, seq.size, 70):
            fh.write(seq[i : i + 70].tobytes() + b"\n")


def synthesize(workdir, n, n_big, rng):
    """n small genomes in planted clusters + n_big multi-megabase genomes.

    Side effect: synthesize.total_bases accumulates the corpus base count
    (the mutate arrays are computed even when files are disk-cached), so
    the harness can report build MBases/s (VERDICT r4 #5).

    Cluster structure: bases drawn from the 10 influenza genomes; members
    of a cluster mutate the same concatenated base at <= 0.015% (the
    corpora are highly repetitive, so mutations ADD distinct k-mers
    without removing shared ones - tiny rates keep within-cluster
    Jaccard ~0.95), singletons at 8-30% (J far below tau)."""
    os.makedirs(workdir, exist_ok=True)
    seqs = load_influenza_seqs()
    files = []
    gi = 0
    while gi < n:
        base = seqs[int(rng.integers(len(seqs)))]
        # concatenate 2-6 copies -> 25-80 kb genomes
        reps = int(rng.integers(2, 7))
        base_big = np.concatenate([mutate(base, 0.001, rng)
                                   for _ in range(reps)])
        cluster = int(rng.integers(1, 4))  # 1 = singleton
        for _ in range(min(cluster, n - gi)):
            rate = 0.00015 * rng.random() if cluster > 1 else \
                0.08 + 0.22 * rng.random()
            g = mutate(base_big, rate, rng)
            f = os.path.join(workdir, f"g{gi:05d}.fna.gz")
            if not os.path.exists(f):
                write_fasta_gz(f, f"g{gi:05d}", g)
            files.append(f)
            synthesize.total_bases += g.size
            gi += 1
    # multi-megabase genomes: > the 4M-code pack budget -> chunked path.
    for b in range(n_big):
        base = seqs[b % len(seqs)]
        big = np.concatenate(
            [mutate(base, 0.002, rng) for _ in range(5_100_000 // base.size + 1)]
        )
        pair_of = b - 1 if b % 2 else None
        f = os.path.join(workdir, f"big{b:02d}.fna.gz")
        if not os.path.exists(f):
            if pair_of is not None:
                # near-duplicate of the previous big genome -> a planted
                # similar pair through the chunked path
                prev = os.path.join(workdir, f"big{b - 1:02d}.fna.gz")
                parts = []
                with gzip.open(prev, "rb") as fh:
                    for line in fh:
                        if not line.startswith(b">"):
                            parts.append(line.strip())
                big = mutate(np.frombuffer(b"".join(parts), np.uint8),
                             0.00005, rng)
            write_fasta_gz(f, f"big{b:02d}", big)
        files.append(f)
        synthesize.total_bases += big.size
    return files


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--big", type=int, default=6)
    ap.add_argument("--tau", type=float, default=0.9)
    ap.add_argument("--criterion", default="smh_a")
    ap.add_argument("--aux-bytes", type=int, default=256)
    ap.add_argument("--workdir", default="/tmp/csc_realscale")
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse sketches already in workdir")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (site plugin pins axon)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from cuda_selection_criteria_tpu import enable_compile_cache

    enable_compile_cache()
    from cuda_selection_criteria_tpu.models.bank import (
        SketchBank, build_bank_from_files,
    )
    from cuda_selection_criteria_tpu.parallel.selection import (
        SelectionParams, select_pairs,
    )
    from cuda_selection_criteria_tpu.parallel.screened import (
        select_pairs_screened,
    )
    from cuda_selection_criteria_tpu.utils.hostref import select_pairs_host

    rng = np.random.default_rng(0xC0FFEE)
    t0 = time.perf_counter()
    synthesize.total_bases = 0
    files = synthesize(args.workdir, args.n, args.big, rng)
    total_mbases = synthesize.total_bases / 1e6
    t_synth = time.perf_counter() - t0
    total_mb = sum(os.path.getsize(f) for f in files) / 1e6
    print(f"corpus: {len(files)} genomes, {total_mb:.1f} MB gz, "
          f"synth {t_synth:.1f}s", flush=True)

    t0 = time.perf_counter()
    if args.skip_build:
        bank = SketchBank.from_sketch_files(
            files, criterion=args.criterion, aux_bytes=args.aux_bytes)
    else:
        bank = build_bank_from_files(
            files, criterion=args.criterion, aux_bytes=args.aux_bytes)
        bank.write_sketch_files()
    t_build = time.perf_counter() - t0
    print(f"build: {t_build:.1f}s "
          f"({total_mbases / t_build:.1f} MBases/s over "
          f"{total_mbases:.0f} MBases)", flush=True)

    # Persistence roundtrip at scale: reload from the reference-format
    # sketch files and require identical arrays.
    bank2 = SketchBank.from_sketch_files(
        files, criterion=args.criterion, aux_bytes=args.aux_bytes)
    assert np.array_equal(bank.regs, bank2.regs), "regs roundtrip mismatch"
    if bank.aux is not None:
        assert np.array_equal(bank.aux, bank2.aux), "aux roundtrip mismatch"
    print("sketch-file roundtrip: byte-exact", flush=True)

    params = SelectionParams(tau=args.tau, criterion=args.criterion,
                             aux_bytes=args.aux_bytes)
    t0 = time.perf_counter()
    got = select_pairs_screened(bank, params)
    t_select = time.perf_counter() - t0
    print(f"select (screened engine): {t_select:.1f}s, {len(got)} pairs",
          flush=True)

    t0 = time.perf_counter()
    want = select_pairs_host(bank, args.tau, args.criterion)
    t_host = time.perf_counter() - t0

    def fmt(rs):
        return [f"{a} {b} {j:.6f}" for a, b, j in rs]

    assert fmt(want) == fmt(got), (
        f"MISMATCH: host={len(want)} engine={len(got)}\n"
        f"host-only={set(fmt(want)) - set(fmt(got))}\n"
        f"engine-only={set(fmt(got)) - set(fmt(want))}"
    )
    big_pairs = [p for p in got if "big" in p[0] or "big" in p[1]]
    print(json.dumps({
        "n_genomes": len(files),
        "corpus_gz_mb": round(total_mb, 1),
        "criterion": args.criterion,
        "tau": args.tau,
        "pairs": len(got),
        "big_genome_pairs": len(big_pairs),
        "build_secs": round(t_build, 1),
        "build_mbases_per_sec": round(total_mbases / t_build, 2),
        "build_over_select": round(t_build / max(t_select, 1e-9), 2),
        "select_secs": round(t_select, 1),
        "host_reference_secs": round(t_host, 1),
        "exact_match": True,
    }), flush=True)


if __name__ == "__main__":
    main()
