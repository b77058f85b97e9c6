"""Canonicalization spec: surface-form normalization, blocking keys, and the
link rule for entity union-find.

This replaces the reference's only near-dup mechanism — complete-linkage
embedding clustering over phrases (nlp/topic_modeling.py:31-36) — with the
scalable idiom the north rule pins: union-find connected components over
blocking keys, computed distributively via groupby + iterative min-label
propagation (stages/canon.py). This module is the pure per-string spec
shared by the distributed implementation and the single-process oracle.

Motivating data: the reference golden output (results.json) contains
surface variants "John B Larson" (2,174 docs) / "John B. Larson" (354) /
"John Larson" (232) that must collapse to ONE canonical node.

Spec:
- ``norm_surface`` = clean_text_topic semantics (lower, drop non-word chars
  except space/hyphen, collapse whitespace) — so "John B. Larson" and
  "John B Larson" normalize identically.
- blocking keys for a form with tokens t[0..n-1]: {"F:"+t[0], "L:"+t[-1]}
  — a form can appear in TWO blocks, so components may span blocks and the
  distributed CC must iterate to fixpoint (exactly the machinery the north
  rule requires).
- link rule (within a block): two forms link iff first tokens equal AND
  last tokens equal ("john b larson" ~ "john larson"; NOT "john" ~
  "john larson").
- canonical representative of a component = lexicographically smallest
  normalized form (deterministic across processes and partitions).
"""

from __future__ import annotations

from semantic_search_system_ray.functions.text import clean_text_topic


def norm_surface(surface: str) -> str:
    return clean_text_topic(surface)


def first_last(norm: str) -> tuple[str, str]:
    toks = norm.split()
    if not toks:
        return ("", "")
    return (toks[0], toks[-1])


def blocking_keys(norm: str) -> list[str]:
    f, l = first_last(norm)
    if not f:
        return []
    keys = ["F:" + f]
    if l != f:
        keys.append("L:" + l)
    return keys


def links(norm_a: str, norm_b: str) -> bool:
    """True iff the two normalized forms should merge."""
    return norm_a != norm_b and first_last(norm_a) == first_last(norm_b)


def canonicalize_exact(surfaces: list[str]) -> dict[str, str]:
    """Single-process reference implementation (oracle + unit tests):
    classic union-find over all blocking-key co-occurrences.

    Returns raw surface -> canonical normalized form.
    """
    norms = {s: norm_surface(s) for s in surfaces}
    uniq = sorted(set(norms.values()))
    parent = {n: n for n in uniq}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # deterministic: smaller string wins as root
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    blocks: dict[str, list[str]] = {}
    for n in uniq:
        for k in blocking_keys(n):
            blocks.setdefault(k, []).append(n)
    for members in blocks.values():
        by_pair: dict[tuple[str, str], list[str]] = {}
        for n in members:
            by_pair.setdefault(first_last(n), []).append(n)
        for group in by_pair.values():
            rep = min(group)
            for n in group:
                union(n, rep)

    # canonical = min member of component
    comp_min: dict[str, str] = {}
    for n in uniq:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return {s: comp_min[find(norms[s])] for s in surfaces}
