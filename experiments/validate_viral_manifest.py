"""Manifest-driven real-corpus validation (VERDICT round 2, missing #1).

The reference ships its real evaluation corpus as an NCBI Datasets
manifest (datasets/Manifests/viral_rs_manifest.zip: 11,213 viral RefSeq
assemblies with per-assembly length / GC% / segment-count / organism
metadata) but not the sequences themselves, and this sandbox has no
network egress to fetch them. So this harness synthesizes a corpus from
the manifest's REAL marginals - every synthetic genome takes its exact
total length, GC fraction, and segment structure from one actual RefSeq
record, and relatedness clusters follow the manifest's own taxonomy
(records sharing a taxId become mutated strains of one ancestor, which is
what RefSeq strain sets are) - then runs the full pipeline:

    gzipped multi-segment FASTA (with IUPAC ambiguity codes, which real
    viral RefSeq contains and the influenza test set mostly lacks)
      -> build_bank_from_files -> sketch-file roundtrip
      -> select_pairs_screened -> EXACT match vs the sequential scalar
         host reference (pair set + 6-decimal Jaccard strings).

Unlike experiments/validate_real_scale.py (which grows the 10 committed
influenza genomes), nothing here derives from the test corpus: lengths
span the manifest's true 0.2 kb .. 2.2 Mb range, segment counts its true
1..683, and names are the true RefSeq accessions. The remaining gap to
real data - true sequence content - is documented in BASELINE.md.

Usage: python experiments/validate_viral_manifest.py [--n 2048]
       [--tau 0.9] [--criterion smh_a] [--workdir /tmp/csc_viralrs]
"""

import argparse
import gzip
import json
import os
import sys
import time
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST = "/root/reference/datasets/Manifests/viral_rs_manifest.zip"
BASES = np.frombuffer(b"ACGT", np.uint8)
# Rare IUPAC ambiguity codes present in real RefSeq assemblies; the
# k-mer scanner must treat every one as invalid (reference: the 2-bit
# encoder's default branch - SURVEY.md L0/L1 scanner semantics).
IUPAC = np.frombuffer(b"RYSWKMBDHVN", np.uint8)


def load_manifest(path=MANIFEST):
    """[(accession, cluster_key, length, gc_frac, n_segments)] for every
    assembly record in the reference's manifest. cluster_key groups
    same-genus assemblies of comparable size (same log2-length bucket) -
    the manifest's per-taxId strain sets are too sparse (184 of 11,213
    records) to plant enough similar pairs, while genus+size groups
    (phage families, influenza strain sets) give hundreds of clusters."""
    with zipfile.ZipFile(path) as z:
        raw = z.read("ncbi_dataset/data/assembly_data_report.jsonl")
    recs = []
    for line in raw.decode().strip().splitlines():
        r = json.loads(line)
        stats = r.get("assemblyStats", {})
        length = int(stats.get("totalSequenceLength", 0))
        if length <= 0:
            continue
        genus = r.get("organism", {}).get("organismName", "?").split()[0]
        recs.append((
            r["accession"],
            (genus, length.bit_length()),
            length,
            float(stats.get("gcPercent", 50.0)) / 100.0,
            max(1, int(stats.get("numberOfComponentSequences", 1))),
        ))
    return recs


def sample_records(recs, n, rng):
    """n records preserving the manifest's length distribution: sort by
    length, take evenly spaced order statistics (stratified); cluster
    siblings (same genus + size bucket) survive because they sit adjacent
    in the sorted order."""
    recs = sorted(recs, key=lambda r: r[2])
    if n >= len(recs):
        return recs
    idx = np.linspace(0, len(recs) - 1, n).astype(int)
    return [recs[i] for i in np.unique(idx)]


def random_genome(length, gc, rng):
    """Random sequence with the record's exact length and GC fraction."""
    probs = np.array([(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2])
    return BASES[rng.choice(4, size=length, p=probs)]


def mutate(seq, rate, rng):
    seq = seq.copy()
    k = rng.binomial(seq.size, rate)
    if k:
        pos = rng.choice(seq.size, size=k, replace=False)
        seq[pos] = BASES[rng.integers(0, 4, k)]
    return seq


def sprinkle_iupac(seq, rng, rate=1e-4):
    """Real RefSeq carries occasional ambiguity codes; ~1 per 10 kb."""
    k = rng.binomial(seq.size, rate)
    if k:
        pos = rng.choice(seq.size, size=k, replace=False)
        seq = seq.copy()
        seq[pos] = IUPAC[rng.integers(0, len(IUPAC), k)]
    return seq


def fit_length(seq, length, rng):
    if seq.size == length:
        return seq
    if seq.size > length:
        off = int(rng.integers(0, seq.size - length + 1))
        return seq[off:off + length]
    reps = -(-length // seq.size)
    return np.tile(seq, reps)[:length]


def write_segmented_fasta_gz(path, accession, seq, n_segments, rng):
    """Split into the record's true segment count (multi-record FASTA -
    every segment boundary exercises the scanner's window reset)."""
    n_segments = min(n_segments, max(1, seq.size // 64))
    cuts = np.sort(rng.choice(np.arange(1, seq.size), size=n_segments - 1,
                              replace=False)) if n_segments > 1 else []
    parts = np.split(seq, cuts)
    with gzip.open(path, "wb", compresslevel=1) as fh:
        for si, part in enumerate(parts):
            fh.write(f">{accession}_seg{si + 1}\n".encode())
            for i in range(0, part.size, 70):
                fh.write(part[i:i + 70].tobytes() + b"\n")


def synthesize(workdir, recs, rng):
    """One gz FASTA per manifest record; records sharing a cluster key
    become strains mutated from one ancestor (rate ladder: half nearly
    identical like real RefSeq strain sets, half diverged)."""
    os.makedirs(workdir, exist_ok=True)
    by_tax = {}
    for rec in recs:
        by_tax.setdefault(rec[1], []).append(rec)

    files = []
    for tax, members in sorted(by_tax.items()):
        acc0, _, len0, gc0, _ = members[0]
        ancestor = random_genome(len0, gc0, rng)
        for mi, (acc, _, length, gc, n_seg) in enumerate(members):
            f = os.path.join(workdir, f"{acc}.fna.gz")
            files.append(f)
            if os.path.exists(f):
                continue
            if mi == 0:
                g = ancestor
            else:
                # strain ladder: half near-identical, half diverged
                rate = 0.0002 * rng.random() if rng.random() < 0.5 \
                    else 0.05 + 0.2 * rng.random()
                g = fit_length(mutate(ancestor, rate, rng), length, rng)
            g = sprinkle_iupac(g, rng)
            write_segmented_fasta_gz(f, acc, g, n_seg, rng)
    return files


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--tau", type=float, default=0.9)
    ap.add_argument("--criterion", default="smh_a")
    ap.add_argument("--aux-bytes", type=int, default=256)
    ap.add_argument("--workdir", default="/tmp/csc_viralrs")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from cuda_selection_criteria_tpu import enable_compile_cache

    enable_compile_cache()
    from cuda_selection_criteria_tpu.models.bank import (
        SketchBank, build_bank_from_files,
    )
    from cuda_selection_criteria_tpu.parallel.selection import SelectionParams
    from cuda_selection_criteria_tpu.parallel.screened import (
        select_pairs_screened,
    )
    from cuda_selection_criteria_tpu.utils.hostref import select_pairs_host

    rng = np.random.default_rng(0x5EED)
    recs = load_manifest()
    picked = sample_records(recs, args.n, rng)
    lengths = np.array([r[2] for r in picked])
    n_clusters = len({r[1] for r in picked})
    print(f"manifest: {len(recs)} records; sampled {len(picked)} "
          f"(lengths {lengths.min()}..{lengths.max()}, median "
          f"{int(np.median(lengths))}; {n_clusters} taxa)", flush=True)

    t0 = time.perf_counter()
    files = synthesize(args.workdir, picked, rng)
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
    print(f"build: {t_build:.1f}s", flush=True)

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
        return [f"{os.path.basename(a)} {os.path.basename(b)} {j:.6f}"
                for a, b, j in rs]

    assert fmt(want) == fmt(got), (
        f"MISMATCH: host={len(want)} engine={len(got)}\n"
        f"host-only={set(fmt(want)) - set(fmt(got))}\n"
        f"engine-only={set(fmt(got)) - set(fmt(want))}"
    )
    print(json.dumps({
        "n_genomes": len(files),
        "corpus_gz_mb": round(total_mb, 1),
        "manifest_records": len(recs),
        "taxa_clusters": n_clusters,
        "length_min": int(lengths.min()),
        "length_max": int(lengths.max()),
        "criterion": args.criterion,
        "tau": args.tau,
        "pairs": len(got),
        "build_secs": round(t_build, 1),
        "select_secs": round(t_select, 1),
        "host_reference_secs": round(t_host, 1),
        "exact_match": True,
    }), flush=True)


if __name__ == "__main__":
    main()
