"""Key/time-range selection -- the ``Region`` abstraction reimagined.

fetchez's ``Region`` is a bbox predicate with parse / buffer / chunk
operations (/root/reference/src/fetchez/spatial.py:42-391).  In a CDC
engine the analogous selection is a (conv_id range, ts range): parse from
a compact string, ``buffer`` widens the time window, ``chunk`` splits the
key range into sub-selections for parallel backfills (chunking ==
input-split parallelism, spatial.py:176-201 / wikigeo.py:43-52).

The predicate is a plain Catalyst expression, so it pushes down to the
parquet scan (PushedFilters) exactly like fetchez ships bbox params to
servers.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from datetime import datetime, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Selection:
    key_min: str | None = None   # conv_id lower bound (inclusive)
    key_max: str | None = None   # conv_id upper bound (exclusive)
    ts_min: datetime | None = None
    ts_max: datetime | None = None

    def predicate(self, key_col: str = "conv_id", ts_col: str = "ts") -> Column:
        p = F.lit(True)
        if self.key_min is not None:
            p = p & (F.col(key_col) >= self.key_min)
        if self.key_max is not None:
            p = p & (F.col(key_col) < self.key_max)
        if self.ts_min is not None:
            p = p & (F.col(ts_col) >= F.lit(self.ts_min))
        if self.ts_max is not None:
            p = p & (F.col(ts_col) < F.lit(self.ts_max))
        return p

    def buffer(self, seconds: float) -> "Selection":
        """Widen the time window (Region.buffer, spatial.py:143-167)."""
        d = timedelta(seconds=seconds)
        return replace(
            self,
            ts_min=self.ts_min - d if self.ts_min else None,
            ts_max=self.ts_max + d if self.ts_max else None,
        )

    def chunk(
        self,
        n: int,
        key_domain: tuple[int, int] = (0, 10**8),
        key_format=None,
        key_parse=None,
    ) -> list["Selection"]:
        """Split the key range into n sub-selections for parallel backfill
        (Region.chunk, spatial.py:176-201).

        ``key_format``/``key_parse`` form the key codec (int <-> key
        string); the default codec is the generator's zero-padded
        ``conv_{i:08d}`` shape.  Any ordered key space plugs in here
        (e.g. hex ids: ``key_format=lambda i: f"{i:016x}"``).

        The final chunk inherits this selection's own ``key_max`` verbatim
        (``None`` stays open): formatting the domain cap ``10**8`` would
        produce the 9-digit string ``conv_100000000``, which sorts BELOW
        8-digit keys like ``conv_20000000`` lexicographically and would
        silently drop most of the last chunk's range."""
        key_format = key_format or (lambda i: f"conv_{i:08d}")
        key_parse = key_parse or (lambda s: int(s.split("_")[1]))
        lo = key_parse(self.key_min) if self.key_min else key_domain[0]
        hi = key_parse(self.key_max) if self.key_max else key_domain[1]
        step = max((hi - lo + n - 1) // n, 1)
        out = []
        for s in range(lo, hi, step):
            last = s + step >= hi
            out.append(
                replace(
                    self,
                    key_min=key_format(s),
                    key_max=self.key_max if last else key_format(s + step),
                )
            )
        return out

    @staticmethod
    def parse(text: str) -> "Selection":
        """Parse ``key:<min>/<max>`` and/or ``ts:<iso>/<iso>`` joined by
        spaces; '-' leaves a bound open (Region parser analog,
        spatial.py:356-391)."""
        sel = Selection()
        for part in text.split():
            kind, _, rng = part.partition(":")
            a, _, b = rng.partition("/")
            if kind == "key":
                sel = replace(
                    sel,
                    key_min=None if a in ("", "-") else a,
                    key_max=None if b in ("", "-") else b,
                )
            elif kind == "ts":
                sel = replace(
                    sel,
                    ts_min=None if a in ("", "-") else datetime.fromisoformat(a),
                    ts_max=None if b in ("", "-") else datetime.fromisoformat(b),
                )
            else:
                raise ValueError(f"unknown selection term {part!r}")
        return sel
