"""Hilbert cell codes as native Spark Column expressions.

Same branch-free bitwise algorithm as
``geos_spark.kernels.hilbert.hilbert_encode`` (reference semantics:
``src/shape/fractal/HilbertCode.cpp:124-193``), expressed as a chain
of integer Column ops so Catalyst/Tungsten codegens it — tile
assignment stays entirely JVM-side. Intermediates are materialized as
temporary projection columns (linear-size plan, no exponential
expression blowup); a parity test checks every level against the
numpy kernel.

uint32 semantics are emulated on LongType: every left-shift is masked
with 0xFFFFFFFF; right shifts on non-negative longs are exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M32 = 0xFFFFFFFF


def _shl(c: Column, n: int) -> Column:
    return F.shiftleft(c, n).bitwiseAND(F.lit(_M32))


def _shr(c: Column, n: int) -> Column:
    return F.shiftright(c, n)


def _interleave_steps(col: str, prefix: str) -> list[tuple[str, object]]:
    """(x | x<<8)&0x00FF00FF ... as 4 chained temp columns."""
    c = F.col(col)
    steps = []
    masks = [
        (8, 0x00FF00FF),
        (4, 0x0F0F0F0F),
        (2, 0x33333333),
        (1, 0x55555555),
    ]
    cur = c
    for i, (sh, m) in enumerate(masks):
        name = f"{prefix}_{i}"
        steps.append(
            (name, (cur.bitwiseOR(_shl(cur, sh))).bitwiseAND(F.lit(m)))
        )
        cur = F.col(name)
    return steps


def with_hilbert_cell(
    df: DataFrame,
    x_col: str,
    y_col: str,
    level: int,
    out: str = "cell",
) -> DataFrame:
    """Add Hilbert cell id (long) computed from integer grid ordinates.

    x_col/y_col must already be grid ordinates in [0, 2^level).
    """
    if level > 16:
        raise ValueError("Level out of range")
    t = "__h_"
    cols: list[tuple[str, Column]] = []

    def ref(n: str) -> Column:
        return F.col(t + n)

    def add(n: str, c: Column) -> None:
        cols.append((t + n, c))

    sh = 16 - level
    add("x", _shl(F.col(x_col).cast("long"), sh) if sh else F.col(x_col).cast("long"))
    add("y", _shl(F.col(y_col).cast("long"), sh) if sh else F.col(y_col).cast("long"))
    x, y = ref("x"), ref("y")

    # round 1 — prime with x, y. NOTE: Spark column names are
    # case-insensitive, so lowercase/uppercase rounds get distinct
    # prefixes (ra1 vs qa1).
    add("ra1", x.bitwiseXOR(y))
    a = ref("ra1")
    add("rb1", a.bitwiseXOR(F.lit(0xFFFF)))
    add("rc1", (x.bitwiseOR(y)).bitwiseXOR(F.lit(0xFFFF)))
    add("rd1", x.bitwiseAND(y.bitwiseXOR(F.lit(0xFFFF))))
    b, c, d = ref("rb1"), ref("rc1"), ref("rd1")
    add("qa1", a.bitwiseOR(_shr(b, 1)))
    add("qb1", _shr(a, 1).bitwiseXOR(a))
    add("qc1", _shr(c, 1).bitwiseXOR(b.bitwiseAND(_shr(d, 1))).bitwiseXOR(c))
    add("qd1", a.bitwiseAND(_shr(c, 1)).bitwiseXOR(_shr(d, 1)).bitwiseXOR(d))

    prev = ("qa1", "qb1", "qc1", "qd1")
    for rnd, s in ((2, 2), (3, 4)):
        a, b, c, d = (ref(n) for n in prev)
        ab = a.bitwiseXOR(b)
        add(f"qa{rnd}", a.bitwiseAND(_shr(a, s)).bitwiseXOR(b.bitwiseAND(_shr(b, s))))
        add(f"qb{rnd}", a.bitwiseAND(_shr(b, s)).bitwiseXOR(b.bitwiseAND(_shr(ab, s))))
        add(f"qc{rnd}", c.bitwiseXOR(a.bitwiseAND(_shr(c, s)).bitwiseXOR(b.bitwiseAND(_shr(d, s)))))
        add(f"qd{rnd}", d.bitwiseXOR(b.bitwiseAND(_shr(c, s)).bitwiseXOR(ab.bitwiseAND(_shr(d, s)))))
        prev = (f"qa{rnd}", f"qb{rnd}", f"qc{rnd}", f"qd{rnd}")

    a, b, c, d = (ref(n) for n in prev)
    ab = a.bitwiseXOR(b)
    add("qc4", c.bitwiseXOR(a.bitwiseAND(_shr(c, 8)).bitwiseXOR(b.bitwiseAND(_shr(d, 8)))))
    add("qd4", d.bitwiseXOR(b.bitwiseAND(_shr(c, 8)).bitwiseXOR(ab.bitwiseAND(_shr(d, 8)))))
    c4, d4 = ref("qc4"), ref("qd4")
    add("fa", c4.bitwiseXOR(_shr(c4, 1)))
    add("fb", d4.bitwiseXOR(_shr(d4, 1)))
    add("i0", x.bitwiseXOR(y))
    i0 = ref("i0")
    add(
        "i1",
        ref("fb").bitwiseOR(
            F.lit(0xFFFF).bitwiseXOR(i0.bitwiseOR(ref("fa")))
        ),
    )

    # build all temps in one pass
    out_df = df.withColumns(dict(cols[:2]))
    # withColumns evaluates in parallel, so dependent temps need stages
    for name, expr in cols[2:]:
        out_df = out_df.withColumn(name, expr)

    for name, expr in _interleave_steps(t + "i0", t + "il0"):
        out_df = out_df.withColumn(name, expr)
    for name, expr in _interleave_steps(t + "i1", t + "il1"):
        out_df = out_df.withColumn(name, expr)

    cell = _shr(
        _shl(F.col(t + "il1_3"), 1).bitwiseOR(F.col(t + "il0_3")),
        32 - 2 * level,
    )
    out_df = out_df.withColumn(out, cell)
    drop = [n for n, _ in cols]
    drop += [t + f"il0_{i}" for i in range(4)]
    drop += [t + f"il1_{i}" for i in range(4)]
    return out_df.drop(*drop)


def with_tile_cells_exploded(
    df: DataFrame,
    bbox_cols: tuple[str, str, str, str],
    level: int,
    extent: tuple[float, float, float, float],
    out: str = "cell",
    pad: float = 0.0,
    keep_grid: bool = False,
) -> DataFrame:
    """Explode each row to every tile its (optionally padded) envelope
    overlaps — fully native (sequence + explode + Hilbert chain), so it
    is safe on join build sides and broadcast plans (a python UDF there
    defeats codegen and costs seconds per stage).
    """
    minx, miny, maxx, maxy = extent
    n = 1 << level
    sx = (maxx - minx) / n
    sy = (maxy - miny) / n
    xmin, ymin, xmax, ymax = (F.col(c) for c in bbox_cols)
    if pad:
        xmin, ymin = xmin - F.lit(pad), ymin - F.lit(pad)
        xmax, ymax = xmax + F.lit(pad), ymax + F.lit(pad)

    def clamp(c: Column) -> Column:
        return F.greatest(F.lit(0), F.least(F.lit(n - 1), c))

    gx0 = clamp(F.floor((xmin - F.lit(minx)) / F.lit(sx)))
    gx1 = clamp(F.floor((xmax - F.lit(minx)) / F.lit(sx)))
    gy0 = clamp(F.floor((ymin - F.lit(miny)) / F.lit(sy)))
    gy1 = clamp(F.floor((ymax - F.lit(miny)) / F.lit(sy)))
    tmp = (
        df.withColumn("__gx", F.explode(F.sequence(gx0, gx1)))
        .withColumn("__gy", F.explode(F.sequence(gy0, gy1)))
    )
    res = with_hilbert_cell(tmp, "__gx", "__gy", level, out)
    if keep_grid:
        return res.withColumnsRenamed({"__gx": "gx", "__gy": "gy"})
    return res.drop("__gx", "__gy")


def with_tile_cell(
    df: DataFrame,
    x_col: str,
    y_col: str,
    level: int,
    extent: tuple[float, float, float, float],
    out: str = "cell",
) -> DataFrame:
    """Point coordinates -> containing-tile Hilbert cell (native).

    Tiles partition the extent into 2^level x 2^level squares; grid
    ordinates are clamped to [0, 2^level - 1] so boundary/outside
    points land in the edge tiles.
    """
    minx, miny, maxx, maxy = extent
    n = 1 << level
    sx = (maxx - minx) / n
    sy = (maxy - miny) / n
    gx = F.floor((F.col(x_col) - F.lit(minx)) / F.lit(sx))
    gy = F.floor((F.col(y_col) - F.lit(miny)) / F.lit(sy))
    gx = F.greatest(F.lit(0), F.least(F.lit(n - 1), gx))
    gy = F.greatest(F.lit(0), F.least(F.lit(n - 1), gy))
    tmp = df.withColumn("__gx", gx).withColumn("__gy", gy)
    return with_hilbert_cell(tmp, "__gx", "__gy", level, out).drop(
        "__gx", "__gy"
    )
