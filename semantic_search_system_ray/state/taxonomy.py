"""Human-in-the-loop taxonomy CRUD — the reference's only write-path user
surface (explorer_app.py:113-232, human_feedback/human_feedback.py:64-120),
re-expressed as PURE edits over the taxonomy table + mismatch flags that
re-feed the KG build (SURVEY §2.10: row-level table edits + incremental
downstream rebuild).

Semantics parity with the reference (each rule cites its source):
- add_topic: new empty topic; existing name → no-op warning
  (explorer_app.py:113-126).
- rename_topic: collision with an existing topic is an ERROR; mismatch
  flags follow the rename (explorer_app.py:128-145).
- delete_topic: drops the topic AND its mismatch flags
  (explorer_app.py:147-158).
- add_phrase: strips the phrase, keeps the member list SORTED, duplicate →
  no-op warning (explorer_app.py:160-173).
- move_phrase: creates the target topic if missing, removes the
  (source, phrase) mismatch flag (explorer_app.py:175-201).
- delete_phrase: removes the phrase and its mismatch flag
  (explorer_app.py:203-216).
- to_table/save: phrases deduped + sorted per topic (download_data,
  explorer_app.py:218-232).

The taxonomy is the J1 SMALL side (tiny, broadcast) — driver-side edits
are the right scale shape; the expensive work is the downstream rebuild,
which stays distributed (pipelines/runner.refresh_taxonomy re-runs ONLY
the taxonomy-dependent branches against committed Phase-A outputs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa


class TaxonomyEditError(ValueError):
    """An edit the reference UI surfaces as st.error (hard failure)."""


@dataclass
class Taxonomy:
    """topic → sorted phrase list, plus (topic, phrase) mismatch flags."""

    topics: dict[str, list[str]] = field(default_factory=dict)
    mismatches: set[tuple[str, str]] = field(default_factory=set)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_table(cls, table: pa.Table) -> "Taxonomy":
        """(broad_topic, phrase) rows → Taxonomy. Null/empty phrase rows
        represent empty topics."""
        topics: dict[str, list[str]] = {}
        for row in table.to_pylist():
            t = row["broad_topic"]
            p = row.get("phrase")
            topics.setdefault(t, [])
            if p:
                topics[t].append(p)
        for t in topics:
            topics[t] = sorted(set(topics[t]))
        return cls(topics=topics)

    def to_table(self) -> pa.Table:
        """Taxonomy → (broad_topic, phrase) rows, phrases deduped+sorted
        per topic (reference download_data); empty topics emit one
        null-phrase row so they round-trip."""
        bt, ph = [], []
        for t in sorted(self.topics):
            members = sorted(set(self.topics[t]))
            if not members:
                bt.append(t)
                ph.append(None)
            for p in members:
                bt.append(t)
                ph.append(p)
        return pa.Table.from_pydict(
            {"broad_topic": pa.array(bt, pa.string()), "phrase": pa.array(ph, pa.string())}
        )

    def summary_table(self) -> pa.Table:
        """(Topic, phrase count) sorted by topic (get_topic_summary,
        explorer_app.py:103-111)."""
        ts = sorted(self.topics)
        return pa.Table.from_pydict(
            {"broad_topic": pa.array(ts, pa.string()),
             "phrase_count": pa.array([len(self.topics[t]) for t in ts], pa.int64())}
        )

    # -- topic CRUD --------------------------------------------------------
    def add_topic(self, name: str) -> bool:
        if not name:
            raise TaxonomyEditError("topic name must be non-empty")
        if name in self.topics:
            return False  # reference: warning, state unchanged
        self.topics[name] = []
        return True

    def rename_topic(self, old: str, new: str) -> None:
        if not old or not new:
            raise TaxonomyEditError("both old and new topic names required")
        if old not in self.topics:
            raise TaxonomyEditError(f"unknown topic {old!r}")
        if new in self.topics and new != old:
            raise TaxonomyEditError(f"topic {new!r} already exists")
        if new == old:
            return
        self.topics = {new if t == old else t: ps for t, ps in self.topics.items()}
        self.mismatches = {
            (new if t == old else t, p) for t, p in self.mismatches
        }

    def delete_topic(self, name: str) -> int:
        if name not in self.topics:
            raise TaxonomyEditError(f"unknown topic {name!r}")
        count = len(self.topics.pop(name))
        self.mismatches = {(t, p) for t, p in self.mismatches if t != name}
        return count

    # -- phrase CRUD -------------------------------------------------------
    def add_phrase(self, topic: str, phrase: str) -> bool:
        if topic not in self.topics:
            raise TaxonomyEditError(f"unknown topic {topic!r}")
        phrase = str(phrase).strip()
        if not phrase:
            raise TaxonomyEditError("phrase cannot be empty")
        if phrase in self.topics[topic]:
            return False  # reference: warning
        self.topics[topic].append(phrase)
        self.topics[topic].sort()
        return True

    def move_phrase(self, phrase: str, source: str, target: str) -> None:
        if not (phrase and source and target):
            raise TaxonomyEditError("phrase, source and target all required")
        if source not in self.topics or phrase not in self.topics[source]:
            raise TaxonomyEditError(f"phrase {phrase!r} not in {source!r}")
        target = str(target).strip()
        if not target:
            raise TaxonomyEditError("target topic cannot be empty")
        self.topics.setdefault(target, [])  # reference: creates on demand
        self.topics[source].remove(phrase)
        if phrase not in self.topics[target]:
            self.topics[target].append(phrase)
            self.topics[target].sort()
        self.mismatches.discard((source, phrase))

    def delete_phrase(self, topic: str, phrase: str) -> bool:
        if topic not in self.topics:
            raise TaxonomyEditError(f"unknown topic {topic!r}")
        if phrase not in self.topics[topic]:
            return False  # reference: warning
        self.topics[topic].remove(phrase)
        self.mismatches.discard((topic, phrase))
        return True

    # -- mismatch flags ----------------------------------------------------
    def flag_mismatch(self, topic: str, phrase: str) -> None:
        if topic not in self.topics or phrase not in self.topics[topic]:
            raise TaxonomyEditError(f"({topic!r}, {phrase!r}) not in taxonomy")
        self.mismatches.add((topic, phrase))

    def unflag_mismatch(self, topic: str, phrase: str) -> None:
        self.mismatches.discard((topic, phrase))

    def mismatch_table(self) -> pa.Table:
        rows = sorted(self.mismatches)
        return pa.Table.from_pydict(
            {"broad_topic": pa.array([t for t, _ in rows], pa.string()),
             "phrase": pa.array([p for _, p in rows], pa.string())}
        )
