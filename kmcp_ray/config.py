"""Frozen pipeline configuration.

Correctness versus the reference implementation is only defined *at the
same shingle/signature config* (BASELINE.json north_rule) — exactly as
kmcp stores sketch parameters (k sizes, scale, canonical flag, ...) in
the database header and re-uses them at query time (reference:
kmcp/cmd/util-db-info.go, util-db-search.go:1037-1107).  Everything that
affects which pairs are discovered lives here, is shared verbatim by the
engine (kmcp_ray/*) and the pure-Python oracle (tests/oracle.py), and is
persisted next to pipeline outputs as JSON so a resumed job can refuse a
config mismatch the same way kmcp refuses an index/version mismatch
(reference: kmcp/cmd/index/serialization.go:90-99).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass

MAX_U64 = (1 << 64) - 1


@dataclass(frozen=True)
class DedupConfig:
    # --- sketching (kmcp `compute` analogue) ---
    #: word-shingle width; captions shorter than this yield one shingle
    #: made of all their tokens.
    shingle_k: int = 3
    #: FracMinHash scale for the *stored* sketch: keep hash <= 2**64//scale.
    #: 1 == keep every shingle hash (exact sets; right for short captions).
    #: Large-document pipelines raise this (kmcp -D/--scale analogue,
    #: reference: kmcp/cmd/compute.go:311-316).
    scale: int = 1
    #: sketcher family (kmcp -D / -W / -S analogues,
    #: compute.go:746-803): "scaled" = FracMinHash keep-rate filter;
    #: "minimizer" = per-row window minima of the shingle-hash sequence
    #: (window = minimizer_w); "syncmer" = closed syncmers (keep a
    #: shingle iff its min token-hash sits at the first or last
    #: position).  The frozen oracle contract covers "scaled".
    sketcher: str = "scaled"
    minimizer_w: int = 8
    #: shingle/content hash family: "siphash" (production — pandas
    #: SipHash token fold, vectorized C) or "md5" (SQL-mirrorable
    #: oracle twin: md5-prefix64 of the space-joined shingle STRING and
    #: of the raw caption — DuckDB ('0x'||substr(md5(s),1,16))::UBIGINT;
    #: see hashing.md5_lower64).  Everything downstream of the shingle
    #: hash (MinHash perms, band folds, contain salt, exact combine,
    #: bkey packing) is the SAME code in both modes — the md5 twin
    #: exists so driver entries like bucket_stats get a DuckDB oracle,
    #: the same pattern as the simhash/fingerprint oracle entries.
    hash_mode: str = "siphash"
    #: multi-k accumulation (kmcp -k 21,31,41 analogue,
    #: compute.go:746-803): when non-empty, the "scaled" sketch unions
    #: every listed k's shingle hashes (k-tagged folds never collide
    #: across ks); empty = single shingle_k.
    shingle_ks: tuple = ()
    # --- MinHash-LSH banding (kmcp index-block analogue) ---
    #: 16 bands x 4 rows: P(band hit | J=0.75) ≈ 0.9978 on its own; the
    #: shared-shingle containment generator independently catches the
    #: same pairs, pushing combined recall ≥ 0.999 at half the signature
    #: cost of 128 perms.
    num_perm: int = 64
    bands: int = 16                      # rows_per_band = num_perm // bands
    # --- candidate generation by shared scaled shingle (containment path) ---
    #: scale for the shingle-bucket emission: only shingle hashes
    #: <= 2**64//bucket_scale become bucket keys.  This bounds the row
    #: blow-up of the containment shuffle.
    bucket_scale: int = 2
    # --- verification thresholds (kmcp search qCov/jacc analogue) ---
    jaccard_threshold: float = 0.7
    containment_threshold: float = 0.9
    #: pairs whose *smaller* sketch has fewer distinct shingles than this
    #: are not eligible for the containment (substr) path — too noisy
    #: (kmcp's minimum query length analogue).
    min_containment_shingles: int = 8
    #: pair verification uses the bottom-``verify_k`` elements of each
    #: scaled sketch (classic bottom-k MinHash): bounds the per-row
    #: payload of the verification join for long documents; short
    #: captions (< verify_k shingles) are verified on their exact sets.
    verify_k: int = 64
    # --- pHash Hamming banding ---
    phash_chunks: int = 4                # 64-bit phash -> 4 x 16-bit keys
    hamming_radius: int = 3              # pigeonhole-safe for <= chunks-1
    # --- skew control (kmcp block-size thresholds analogue,
    #     reference: kmcp/cmd/index.go:213-259) ---
    #: buckets larger than this take the salted path: rows are first
    #:  deduplicated by full-signature equality (star edges), then at most
    #: max_bucket distinct representatives are pairwise verified.
    max_bucket: int = 256
    #: shingle-containment buckets larger than this are dominated by a
    #: high-document-frequency shingle that carries no dedup signal
    #: (bucket size == the shingle's df); they emit only identical-sketch
    #: star edges, no pairwise work.  The kmcp analogue is the Bloom FPR
    #: / block-size skew control (reference: kmcp/cmd/index.go:213-259).
    #: At 10^12 rows any popular phrase would otherwise explode the
    #: candidate set quadratically; genuine containment dups share RARE
    #: shingles (df 2-5), which stay under this cap.
    max_shingle_df: int = 8
    # --- shuffle shape ---
    num_partitions: int = 64
    #: verification-sketch tables up to this many rows are broadcast
    #: (ray.put once, ~0.5 KB/row) instead of joined — kmcp's
    #: load-whole-index vs mmap mode switch (search.go:66-83 analogue).
    #: The table lives once per NODE in the shared-memory object store
    #: (workers map it zero-copy), so the bound is node plasma capacity,
    #: not per-worker heap: 8M rows ≈ 4 GB — comfortable on the target
    #: nodes; beyond it the partitioned-exchange attach takes over.
    broadcast_verify_rows: int = 8_000_000
    #: edge sets up to this many rows finish union-find on the driver
    #: and broadcast the cluster map; above it, connected components run
    #: fully distributed (cc.labels_via_exchange) and cluster ids are
    #: attached by a partitioned join (pipeline.assign_via_join) — no
    #: driver-resident dict of duplicate rows on dup-heavy corpora.
    broadcast_assign_edges: int = 2_000_000
    #: candidate class-pair streams up to this many rows are extracted
    #: + deduplicated in ONE driver pass over the materialized verifier
    #: output (16 B/pair ⇒ ~512 MB at the default) instead of a
    #: distributed dedup exchange — the r4 tail profile shows those
    #: barriers are ~2-3 s of n-independent latency; past the cap the
    #: exchange arm runs unchanged (pipeline._extract_class_pairs_driver).
    driver_class_pair_rows: int = 32_000_000
    #: the driver extraction pass refuses once the materialized
    #: verifier output exceeds this many bytes: on a multi-node
    #: cluster the driver would FETCH every block to scan it, so the
    #: default is conservative; a single-node deployment (or a driver
    #: co-located with a fat node) can raise it — the scan is
    #: zero-copy local plasma there (r5: the 12.8M-row bench run
    #: tripped the old hard-wired 2 GB gate and fell onto the
    #: exchange arms, which this host executes ~5x slower).
    driver_extract_bytes: int = 2 << 30

    @property
    def rows_per_band(self) -> int:
        return self.num_perm // self.bands

    @property
    def max_hash(self) -> int:
        """Sketch keep-threshold (kmcp maxHash = 2^64/scale)."""
        return MAX_U64 // self.scale

    @property
    def bucket_max_hash(self) -> int:
        return MAX_U64 // self.bucket_scale

    def __post_init__(self) -> None:
        if isinstance(self.shingle_ks, list):
            # JSON round-trips tuples as lists; normalize so resumed
            # configs compare equal
            object.__setattr__(self, "shingle_ks", tuple(self.shingle_ks))
        if self.num_perm % self.bands:
            raise ValueError("num_perm must be divisible by bands")
        if self.hamming_radius > self.phash_chunks - 1:
            # pigeonhole: guaranteed recall at radius r needs >= r+1 chunks
            raise ValueError("hamming_radius must be < phash_chunks")
        if self.phash_chunks not in (1, 2, 4, 8):
            raise ValueError("phash_chunks must divide 64 evenly into chunks")

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "DedupConfig":
        return cls(**json.loads(s))


DEFAULT_CONFIG = DedupConfig()
