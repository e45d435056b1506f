"""Sequential oracle: the reference's grouping semantics over text.

A small, exhaustive (no LSH) plain-Python transplant of the reference
algorithm, used as the recall referee (SURVEY.md §5.2.2):

  1. exact groups by normalized-content key
     (scanner.py:441-476 hash-dict grouping, pixel-normalized keys),
  2. similarity stage over group representatives + singletons
     (scanner.py:549-567 hybrid stage-2 input),
  3. threshold graph — sketch jaccard ≥ τ or containment ≥ τ_c, the
     SAME estimator the pipeline's verify stage uses — over ALL
     candidate pairs (the BK-tree at radius≤20 plus RMS verify
     collapse to this once the verifier is the decider;
     scanner.py:359-395),
  4. BFS connected components (scanner.py:286-310),
  5. per-component representative-verify subgroup split
     (scanner.py:382-395: members join the first subgroup whose
     representative matches; else found a new subgroup),
  6. subgroups merge the exact groups of their members
     (the hybrid group-merge, scanner.py:583-622).

Oversize rows (> content cap) participate via exact keys only — the
same degrade-don't-drop fallback as the pipeline (hasher.py:109-119).
Output: cluster id per row + the set of intra-cluster dup pairs.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

from photo_dedup_spark.config import DEFAULT_CONFIG, DedupConfig
from photo_dedup_spark.functions.keys import norm_key_py
from photo_dedup_spark.functions.signatures import (
    shingle_hashes,
    sketch_overlap_py,
    sketch_py,
)
from photo_dedup_spark.functions.normalize import normalize_py


@dataclass
class OracleResult:
    cluster_of: dict  # row key -> cluster label (min member key)
    dup_pairs: set  # frozenset pairs of row keys sharing a cluster
    n_dropped_null: int


class _Matcher:
    """Same verify definition as the pipeline (sketch Jaccard /
    containment at the frozen config) — referee and subject must share
    the estimator so threshold-boundary decisions agree exactly."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self._sketches: dict[str, tuple[int, object]] = {}

    def sketch_of(self, norm_text: str):
        got = self._sketches.get(norm_text)
        if got is None:
            b, kept = sketch_py(shingle_hashes(norm_text, self.cfg.shingle_k), self.cfg)
            got = (b, kept)
            self._sketches[norm_text] = got
        return got

    def match(self, a_norm: str, b_norm: str) -> bool:
        ba, ska = self.sketch_of(a_norm)
        bb, skb = self.sketch_of(b_norm)
        j, c = sketch_overlap_py(ska, ba, skb, bb)
        return j >= self.cfg.jaccard_threshold or c >= self.cfg.containment_threshold


def cluster_oracle(
    rows: list[tuple],  # (key, content) — key any hashable row id
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> OracleResult:
    n_null = sum(1 for _, c in rows if c is None)
    live = [(k, c) for k, c in rows if c is not None]

    # 1. exact groups on normalized key
    exact_groups: dict[str, list] = defaultdict(list)
    norm_of: dict = {}
    for k, c in live:
        norm = normalize_py(c)
        norm_of[k] = norm
        exact_groups[norm_key_py(c)].append(k)
    for g in exact_groups.values():
        g.sort()

    # 2. similarity stage: one representative per exact group (min key),
    #    oversize reps fall back to exact-only
    reps = [
        g[0]
        for g in exact_groups.values()
        if len(norm_of[g[0]]) <= cfg.content_cap_chars
    ]
    reps.sort()

    # 3. threshold graph over all rep pairs (exhaustive)
    matcher = _Matcher(cfg)
    adj: dict = defaultdict(set)
    for i in range(len(reps)):
        for j in range(i + 1, len(reps)):
            a, b = reps[i], reps[j]
            if matcher.match(norm_of[a], norm_of[b]):
                adj[a].add(b)
                adj[b].add(a)

    # 4. BFS components over reps (scanner.py:286-310)
    comp_of: dict = {}
    components: list[list] = []
    for r in reps:
        if r in comp_of:
            continue
        comp = [r]
        comp_of[r] = len(components)
        queue = [r]
        while queue:
            cur = queue.pop()
            for nb in sorted(adj[cur]):
                if nb not in comp_of:
                    comp_of[nb] = len(components)
                    comp.append(nb)
                    queue.append(nb)
        components.append(sorted(comp))

    # 5. representative-verify subgroup split within each component
    #    (scanner.py:382-395: join first subgroup whose REP matches)
    subgroup_of: dict = {}
    for comp in components:
        subs: list[list] = []
        for m in comp:
            placed = False
            for sub in subs:
                if matcher.match(norm_of[sub[0]], norm_of[m]):
                    sub.append(m)
                    placed = True
                    break
            if not placed:
                subs.append([m])
        for sub in subs:
            label = sub[0]
            for m in sub:
                subgroup_of[m] = label

    # 6. fold exact groups into their representative's subgroup
    cluster_of: dict = {}
    for g in exact_groups.values():
        rep = g[0]
        label = subgroup_of.get(rep, rep)  # oversize reps: own cluster
        for m in g:
            cluster_of[m] = label

    # canonicalize label to min member key; emit dup pairs
    members: dict = defaultdict(list)
    for k, lbl in cluster_of.items():
        members[lbl].append(k)
    final: dict = {}
    pairs: set = set()
    for ms in members.values():
        ms.sort()
        for m in ms:
            final[m] = ms[0]
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add(frozenset((ms[i], ms[j])))
    return OracleResult(final, pairs, n_null)
