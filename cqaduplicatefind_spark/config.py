"""Engine configuration.

All knobs that define duplicate semantics live here so that "identical
shingle/signature config" (BASELINE.json north_rule) is a single frozen object whose
fingerprint is stamped into every checkpointed stage table. The reference hard-codes
its equivalents (top-k=10 at ``src/BM25DuplicateRetriever.py:13``; 150-dim Doc2Vec at
``src/lstm-siamese/config.py``); we make them explicit and deterministic.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


# Mersenne prime 2^61 - 1: modulus for the universal-hash MinHash permutations.
# Classic (a*x + b) mod p construction (Broder 1997, "On the resemblance and
# containment of documents").
MERSENNE_PRIME_61 = (1 << 61) - 1


@dataclass(frozen=True)
class DedupConfig:
    """Frozen duplicate-detection semantics. Hash it into stage-table lineage."""

    # --- shingling ---
    shingle_k: int = 5           # tokens per shingle (w-shingling over normalized tokens)
    lowercase: bool = True
    # False = trust the input text column as ALREADY normalized (tokenized,
    # single-spaced) and skip the reference normalization pass — for corpora
    # pre-cleaned upstream, and for oracle queries whose SQL twin cannot
    # express stopword removal + Porter2 stemming
    normalize_input: bool = True

    # --- MinHash ---
    num_perms: int = 128         # north_star: "128-perm MinHash per Arrow batch"
    minhash_seed: int = 42

    # --- LSH banding: num_perms = bands * rows_per_band ---
    bands: int = 16
    rows_per_band: int = 8

    # --- SimHash ---
    simhash_bits: int = 64
    simhash_seed: int = 7
    hamming_k: int = 3           # match if Hamming distance <= k (pigeonhole: k+1 pieces)

    # --- verification ---
    jaccard_threshold: float = 0.8   # exact-verify cutoff for an edge
    # accept-arm toggles (accept_edges): an edge is accepted on exact Jaccard >=
    # jaccard_threshold, OR (accept_hamming) SimHash Hamming <= hamming_k, OR
    # (containment_accept not None) containment >= containment_accept. Disabling
    # the latter two reduces duplicate semantics to pure set-Jaccard — the
    # SQL-expressible form the driver oracle checks.
    accept_hamming: bool = True
    containment_accept: float | None = 0.95
    min_overlap_span: int = 50       # tokens: exact-span pass (substring containment)
    # corpus-level winnowing-fingerprint pass: discovers pairs sharing an exact
    # contiguous run >= min_overlap_span tokens even when their Jaccard is far
    # below the LSH collision curve (page embedded in a boilerplate shell), each
    # pair exactly verified; edges union into clustering
    span_pass: bool = True
    # what the verify joins ship per doc (the pipeline's dominant shuffle volume):
    # "exact" (shingle sets only; every candidate exactly verified — right for the
    # recall>=0.99 gate and short docs), "estimate" (fixed-width minhash only;
    # right for multi-KB shingle sets where exact verification is a later targeted
    # pass), or "both" (minhash prefilter + exact set ops on survivors)
    verify_evidence: str = "exact"

    # --- skew handling ---
    # band groups larger than this emit O(m) star edges + salted sub-bucket pairs
    # instead of O(m^2) full pairs; a pair colliding in every band otherwise costs
    # bands * C(m,2) shuffle rows. Small groups keep full pairing for
    # verification robustness.
    max_band_group: int = 8
    # hot groups are re-keyed into sub-buckets of expected size max_band_group and
    # fully paired within each (so true-dup pairs inside a heterogeneous hot
    # bucket survive exact-verify, which may reject their star edges); this caps
    # an unlucky/adversarial sub-bucket at salt_buckets * max_band_group members.
    # 0 disables sub-bucket pairing (stars only).
    salt_buckets: int = 8

    # --- retrieval / evaluation ---
    top_k: int = 10              # reference: numberOfRelevantQs=10

    # --- execution ---
    shuffle_partitions: int = 32
    signature_partitions: int = 32   # repartition width for the signature stage

    extra: dict = field(default_factory=dict, compare=False)

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"bands*rows_per_band must equal num_perms "
                f"({self.bands}*{self.rows_per_band} != {self.num_perms})"
            )
        if self.simhash_bits not in (32, 64):
            raise ValueError("simhash_bits must be 32 or 64")
        # fail at config construction, not hours later when the scored_pairs
        # stage's evidence-column lookup finally reads the knob (the
        # normalize/signature/candidate stages would already have run)
        if self.verify_evidence not in ("exact", "estimate", "both"):
            raise ValueError(
                "verify_evidence must be 'exact', 'estimate', or 'both' "
                f"(got {self.verify_evidence!r})"
            )

    # knobs that tune EXECUTION, not duplicate semantics: changing parallelism must
    # not invalidate checkpoints (results are parallelism-independent — proven by
    # the scaling bench's cross-level cluster checksum)
    _EXECUTION_KNOBS = ("shuffle_partitions", "signature_partitions", "extra")

    def fingerprint(self) -> str:
        """Stable hash of duplicate semantics — stamped into checkpoint lineage so a
        resume with a different config never silently reuses stale stage tables.
        Execution-tuning knobs are excluded: re-running with different parallelism
        resumes cleanly from the same checkpoints."""
        payload = {
            k: v for k, v in asdict(self).items() if k not in self._EXECUTION_KNOBS
        }
        blob = json.dumps(payload, sort_keys=True).encode("utf-8")
        return hashlib.sha256(blob).hexdigest()[:16]
