"""Row-at-a-time pure-Python oracle re-implementing the reference
validator's semantics over the transcript model (FIXTURES.md §6).

This deliberately mirrors HOW the reference computes — one record at a
time, dict/set lookups, counters (cf. /root/reference/validate.py:
686-723 per-item pipeline, :658-684 duplicate check, :694-699
accumulation) — so the Spark engine's set-wise results are compared
against an independent implementation, not against itself.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

URL_RE = re.compile(r"(?i)(?:https?://|ftp://|www\.)[^\s]+")
ROLES = {"user", "assistant", "system", "tool"}


def expected_violations(
    turns: list[dict],
    conversations: set[str] | None = None,
    allowed_tools: set[str] | None = None,
) -> list[tuple]:
    """Returns sorted (rule_id, conv_id, turn_idx) tuples.

    Row rules follow the reference's short-circuit: a row failing a
    parse-level rule (not_null / non_empty) is excluded from content
    rules (validate.py:701-716).
    """
    out: list[tuple] = []
    key_counts = Counter((t["conv_id"], t["turn_idx"]) for t in turns)

    for t in turns:
        cid, idx = t["conv_id"], t["turn_idx"]
        text = t["text"]
        parse_ok = True
        if text is None:
            out.append(("not_null.text", cid, idx))
            parse_ok = False
        elif text.strip() == "":
            out.append(("non_empty.text", cid, idx))
            parse_ok = False
        if parse_ok:
            if t["role"] is not None and t["role"] not in ROLES:
                out.append(("vocab.role", cid, idx))
            if text is not None and URL_RE.search(text):
                out.append(("url_in_text.text", cid, idx))
        if key_counts[(cid, idx)] > 1:
            out.append(("unique.turn", cid, idx))
        if conversations is not None and cid not in conversations:
            out.append(("ref.conv_id", cid, idx))
        if allowed_tools is not None and t["tool"] is not None and t["tool"] not in allowed_tools:
            out.append(("ref.tool", cid, idx))
        if t["tool"] is not None and t["role"] is not None and t["role"] != "tool":
            out.append(("tool.role_consistency", cid, idx))

    # sequence rules along (conv_id, turn_idx) ordering
    by_conv: dict[str, list[dict]] = defaultdict(list)
    for t in turns:
        by_conv[t["conv_id"]].append(t)
    for cid, rows in by_conv.items():
        rows = sorted(rows, key=lambda r: (r["turn_idx"],))
        # opening-role: the FIRST turn (min turn_idx; tie-broken by role
        # to mirror the engine's min-of-struct argmin) must be 'system'
        first = min(rows, key=lambda r: (r["turn_idx"], r["role"] or "", r["part"] or ""))
        if first["role"] is not None and first["role"] != "system":
            out.append(("conv.opening_role", cid, first["turn_idx"]))
        prev = None
        for r in rows:
            if prev is not None:
                if r["ts"] < prev["ts"]:
                    out.append(("ts.monotonicity", cid, r["turn_idx"]))
                if r["turn_idx"] - prev["turn_idx"] > 1:
                    out.append(("turn.contiguity", cid, r["turn_idx"]))
            elif r["turn_idx"] != 0:
                out.append(("turn.contiguity", cid, r["turn_idx"]))
            prev = r

    if conversations is not None:
        seen = {t["conv_id"] for t in turns}
        for c in sorted(conversations - seen):
            out.append(("empty.conversation", c, None))

    return sorted(out, key=lambda x: (x[0], str(x[1]), -1 if x[2] is None else x[2]))


def expected_drift_parts(
    turns: list[dict],
    baseline: dict[tuple[str, str], float],
    kl_threshold: float = 0.05,
    kl_chi2_crit: float = 40.0,
    chi2_threshold: float = 100.0,
    roles: set[str] = ROLES,
    tools: set[str] | None = None,
) -> set[tuple[str, str]]:
    """(rule_id, part) pairs expected from the drift family, computed on
    the vocabulary-conforming subset (matching the engine's gating)."""
    eligible = [
        t
        for t in turns
        if (t["role"] is None or t["role"] in roles)
        and (t["tool"] is None or tools is None or t["tool"] in tools)
    ]
    out: set[tuple[str, str]] = set()
    for dim, value_of in (
        ("role", lambda t: t["role"]),
        ("tool", lambda t: t["tool"]),
    ):
        per_part: dict[str, Counter] = defaultdict(Counter)
        for t in eligible:
            v = value_of(t)
            if v is not None:
                per_part[t["part"]][v] += 1
        for part, counts in per_part.items():
            n = sum(counts.values())
            kl = 0.0
            for v, c in counts.items():
                p = c / n
                q = baseline.get((dim, v), 1e-6)
                kl += p * math.log(p / q)
            if kl > kl_threshold and 2 * n * kl > kl_chi2_crit:
                out.add((f"drift.kl.{dim}", part))
    per_part_h: dict[str, Counter] = defaultdict(Counter)
    for t in eligible:
        per_part_h[t["part"]][str(t["ts"].hour)] += 1
    for part, counts in per_part_h.items():
        n = sum(counts.values())
        chi2 = 0.0
        for v, c in counts.items():
            q = baseline.get(("ts_hour_bucket", v), 1e-6)
            e = q * n
            chi2 += (c - e) ** 2 / e
        if chi2 > chi2_threshold:
            out.add(("drift.chi2.ts", part))
    return out
