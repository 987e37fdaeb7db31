"""Hilbert-curve cell codes — the engine's tile/cell id scheme.

Semantics match GEOS exactly (integer-exact, so results are
bit-identical by construction):

- ``encode``/``decode``: the branch-free bitwise Hilbert algorithm
  (public-domain "threadlocalmutex/rawrunprotected hilbert_curves"
  construction) as used by the reference
  (``src/shape/fractal/HilbertCode.cpp:98-193``, MAX_LEVEL=16 at
  ``include/geos/shape/fractal/HilbertCode.h:72``).
- ``encode_envelope``: envelope-midpoint -> grid (x, y) by stride over
  a fixed extent (``src/shape/fractal/HilbertEncoder.cpp:29-55``).
- ``morton_*``: Morton (Z-order) variant
  (``src/shape/fractal/MortonCode.cpp``).

All functions are numpy-vectorized over uint32 arrays and also accept
scalars. ``hilbert_encode_sql`` emits an equivalent ANSI-SQL expression
(pure integer bit ops) so an external SQL engine (DuckDB) can serve as
a correctness oracle for distributed tile assignment.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 16


def level_size(level: int) -> int:
    """Number of cells for a level: 4**level."""
    return 1 << (2 * level)


def max_ordinate(level: int) -> int:
    return (1 << level) - 1


def level_for(num_points: int) -> int:
    """Smallest level whose curve has >= num_points points."""
    pow2 = int(np.log(num_points) / np.log(2))
    level = pow2 // 2
    if level_size(level) < num_points:
        level += 1
    return level


def _check_level(level: int) -> None:
    if level > MAX_LEVEL:
        raise ValueError("Level out of range")


def _u32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint32)


def _deinterleave(x: np.ndarray) -> np.ndarray:
    x = x & np.uint32(0x55555555)
    x = (x | (x >> 1)) & np.uint32(0x33333333)
    x = (x | (x >> 2)) & np.uint32(0x0F0F0F0F)
    x = (x | (x >> 4)) & np.uint32(0x00FF00FF)
    x = (x | (x >> 8)) & np.uint32(0x0000FFFF)
    return x


def _interleave(x: np.ndarray) -> np.ndarray:
    x = (x | (x << 8)) & np.uint32(0x00FF00FF)
    x = (x | (x << 4)) & np.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & np.uint32(0x33333333)
    x = (x | (x << 1)) & np.uint32(0x55555555)
    return x


def _prefix_scan(x: np.ndarray) -> np.ndarray:
    x = (x >> 8) ^ x
    x = (x >> 4) ^ x
    x = (x >> 2) ^ x
    x = (x >> 1) ^ x
    return x


def hilbert_decode(level: int, i) -> tuple[np.ndarray, np.ndarray]:
    """Hilbert index -> (x, y) grid coordinates. Vectorized."""
    _check_level(level)
    i = _u32(i) << np.uint32(32 - 2 * level)

    i0 = _deinterleave(i)
    i1 = _deinterleave(i >> 1)

    t0 = (i0 | i1) ^ np.uint32(0xFFFF)
    t1 = i0 & i1

    prefix_t0 = _prefix_scan(t0)
    prefix_t1 = _prefix_scan(t1)

    a = ((i0 ^ np.uint32(0xFFFF)) & prefix_t1) | (i0 & prefix_t0)

    x = (a ^ i1) >> np.uint32(16 - level)
    y = (a ^ i0 ^ i1) >> np.uint32(16 - level)
    return x, y


def hilbert_encode(level: int, x, y) -> np.ndarray:
    """(x, y) grid coordinates -> Hilbert index. Vectorized uint32."""
    _check_level(level)
    x = _u32(x) << np.uint32(16 - level)
    y = _u32(y) << np.uint32(16 - level)

    # round 1 (prime with x, y)
    a = x ^ y
    b = np.uint32(0xFFFF) ^ a
    c = np.uint32(0xFFFF) ^ (x | y)
    d = x & (y ^ np.uint32(0xFFFF))
    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d

    # rounds 2..3: parallel-prefix with strides 2, 4
    for sh in (np.uint32(2), np.uint32(4)):
        a, b, c, d = A, B, C, D
        A = (a & (a >> sh)) ^ (b & (b >> sh))
        B = (a & (b >> sh)) ^ (b & ((a ^ b) >> sh))
        C = c ^ ((a & (c >> sh)) ^ (b & (d >> sh)))
        D = d ^ ((b & (c >> sh)) ^ ((a ^ b) & (d >> sh)))

    # final round, stride 8, only c/d are needed
    a, b, c, d = A, B, C, D
    C = c ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = d ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))

    # undo prefix scan, recover index bits
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    i0 = x ^ y
    i1 = b | (np.uint32(0xFFFF) ^ (i0 | a))
    return ((_interleave(i1) << 1) | _interleave(i0)) >> np.uint32(32 - 2 * level)


# ----------------------------------------------------------------------
# Envelope -> cell (HilbertEncoder semantics)
# ----------------------------------------------------------------------


def grid_xy(
    level: int,
    midx,
    midy,
    extent: tuple[float, float, float, float],
) -> tuple[np.ndarray, np.ndarray]:
    """Envelope-midpoint -> grid ordinates, HilbertEncoder stride rule.

    stride = extent_width / (2**level - 1); x = floor((midx - minx)/stride)
    when midx > minx else 0 (``HilbertEncoder.cpp:29-55``).
    """
    minx, miny, maxx, maxy = extent
    hside = (1 << level) - 1
    stride_x = (maxx - minx) / hside
    stride_y = (maxy - miny) / hside
    midx = np.asarray(midx, dtype=np.float64)
    midy = np.asarray(midy, dtype=np.float64)
    x = np.zeros(midx.shape, dtype=np.uint32)
    y = np.zeros(midy.shape, dtype=np.uint32)
    if stride_x != 0:
        mx = midx > minx
        x[mx] = ((midx[mx] - minx) / stride_x).astype(np.uint32)
    if stride_y != 0:
        my = midy > miny
        y[my] = ((midy[my] - miny) / stride_y).astype(np.uint32)
    return x, y


def encode_envelope(
    level: int,
    xmin,
    ymin,
    xmax,
    ymax,
    extent: tuple[float, float, float, float],
) -> np.ndarray:
    """Envelope arrays -> Hilbert cell ids (HilbertEncoder::encode)."""
    xmin = np.asarray(xmin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)
    midx = (xmax - xmin) / 2 + xmin
    midy = (ymax - ymin) / 2 + ymin
    x, y = grid_xy(level, midx, midy, extent)
    return hilbert_encode(level, x, y)


# ----------------------------------------------------------------------
# Tile geometry helpers (cells as square tiles over the extent)
# ----------------------------------------------------------------------


def tile_bounds(
    level: int, cell, extent: tuple[float, float, float, float]
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Cell id -> tile bbox. Tiles partition the extent into 2^level
    x 2^level squares (side = extent/2^level); the *encoder* stride
    (2^level - 1) is only used for assignment of envelope midpoints.
    """
    minx, miny, maxx, maxy = extent
    n = 1 << level
    sx = (maxx - minx) / n
    sy = (maxy - miny) / n
    x, y = hilbert_decode(level, cell)
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    return minx + x * sx, miny + y * sy, minx + (x + 1) * sx, miny + (y + 1) * sy


def cells_for_envelope(
    level: int,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
    extent: tuple[float, float, float, float],
) -> np.ndarray:
    """All cells whose tile square intersects the envelope (scalar env).

    Used for multi-cell assignment (distance joins / tiling); the
    single-cell midpoint rule above matches the GEOS oracle.
    """
    minx, miny, maxx, maxy = extent
    n = 1 << level
    sx = (maxx - minx) / n
    sy = (maxy - miny) / n
    x0 = min(max(int((xmin - minx) / sx), 0), n - 1)
    x1 = min(max(int((xmax - minx) / sx), 0), n - 1)
    y0 = min(max(int((ymin - miny) / sy), 0), n - 1)
    y1 = min(max(int((ymax - miny) / sy), 0), n - 1)
    xs = np.arange(x0, x1 + 1, dtype=np.uint32)
    ys = np.arange(y0, y1 + 1, dtype=np.uint32)
    gx, gy = np.meshgrid(xs, ys)
    return hilbert_encode(level, gx.ravel(), gy.ravel())


# ----------------------------------------------------------------------
# Morton (Z-order) variant — MortonCode.cpp:90-102
# ----------------------------------------------------------------------


def morton_encode(level: int, x, y) -> np.ndarray:
    _check_level(level)
    return (_interleave(_u32(y)) << 1) | _interleave(_u32(x))


def morton_decode(level: int, i) -> tuple[np.ndarray, np.ndarray]:
    _check_level(level)
    i = _u32(i)
    return _deinterleave(i), _deinterleave(i >> 1)


# ----------------------------------------------------------------------
# SQL oracle emitter — the same bitwise algorithm as one ANSI SQL
# expression (DuckDB dialect: xor(a,b); &, |, >>, << operators).
# ----------------------------------------------------------------------


def _sql_deinterleave(x: str) -> str:
    e = f"(({x}) & 1431655765)"
    e = f"(({e} | ({e} >> 1)) & 858993459)"
    e = f"(({e} | ({e} >> 2)) & 252645135)"
    e = f"(({e} | ({e} >> 4)) & 16711935)"
    e = f"(({e} | ({e} >> 8)) & 65535)"
    return e


def _sql_interleave(x: str) -> str:
    e = f"((({x}) | (({x}) << 8)) & 16711935)"
    e = f"(({e} | ({e} << 4)) & 252645135)"
    e = f"(({e} | ({e} << 2)) & 858993459)"
    e = f"(({e} | ({e} << 1)) & 1431655765)"
    return e


def hilbert_encode_sql(level: int, x_expr: str, y_expr: str) -> str:
    """Emit a DuckDB SQL expression computing hilbert_encode(level,x,y).

    Uses a chain of scalar subquery-free LATERAL-style nested CTE
    references is avoided: the whole thing is one (large) expression
    tree over integer columns, suitable for embedding in an oracle
    query. xor() is the DuckDB bitwise-xor function.
    """
    _check_level(level)

    def X(a: str, b: str) -> str:
        return f"xor({a}, {b})"

    sh = 16 - level
    x = f"((({x_expr}) << {sh}) & 4294967295)" if sh else f"({x_expr})"
    y = f"((({y_expr}) << {sh}) & 4294967295)" if sh else f"({y_expr})"

    lines = [f"sx AS ({x})", f"sy AS ({y})"]
    # round 1
    lines += [
        "r1a AS (xor(sx, sy))",
        "r1b AS (xor(65535, r1a))",
        "r1c AS (xor(65535, (sx | sy)))",
        "r1d AS ((sx & xor(sy, 65535)))",
        "a1 AS ((r1a | (r1b >> 1)))",
        "b1 AS (xor((r1a >> 1), r1a))",
        "c1 AS (xor(xor((r1c >> 1), (r1b & (r1d >> 1))), r1c))",
        "d1 AS (xor(xor((r1a & (r1c >> 1)), (r1d >> 1)), r1d))",
    ]
    prev = ("a1", "b1", "c1", "d1")
    for rnd, s in ((2, 2), (3, 4)):
        a, b, c, d = prev
        A, B, C, D = f"a{rnd}", f"b{rnd}", f"c{rnd}", f"d{rnd}"
        lines += [
            f"{A} AS (xor(({a} & ({a} >> {s})), ({b} & ({b} >> {s}))))",
            f"{B} AS (xor(({a} & ({b} >> {s})), ({b} & (xor({a}, {b}) >> {s}))))",
            f"{C} AS (xor({c}, xor(({a} & ({c} >> {s})), ({b} & ({d} >> {s})))))",
            f"{D} AS (xor({d}, xor(({b} & ({c} >> {s})), (xor({a}, {b}) & ({d} >> {s})))))",
        ]
        prev = (A, B, C, D)
    a, b, c, d = prev
    lines += [
        f"c4 AS (xor({c}, xor(({a} & ({c} >> 8)), ({b} & ({d} >> 8)))))",
        f"d4 AS (xor({d}, xor(({b} & ({c} >> 8)), (xor({a}, {b}) & ({d} >> 8)))))",
        "fa AS (xor(c4, (c4 >> 1)))",
        "fb AS (xor(d4, (d4 >> 1)))",
        "i0 AS (xor(sx, sy))",
        "i1 AS ((fb | xor(65535, (i0 | fa))))",
    ]
    # assemble as one expression by textual substitution (innermost first)
    env: dict[str, str] = {}
    for ln in lines:
        name, expr = ln.split(" AS ", 1)
        expr = expr.strip()[1:-1]  # strip outer parens added above
        for k in sorted(env, key=len, reverse=True):
            expr = _subst(expr, k, env[k])
        env[name.strip()] = f"({expr})"
    il1 = _sql_interleave(env["i1"])
    il0 = _sql_interleave(env["i0"])
    return f"((((({il1}) << 1) & 4294967295) | ({il0})) >> {32 - 2 * level})"


def hilbert_sql_ctes(
    level: int, src: str, x_col: str, y_col: str, out_col: str = "cell"
) -> tuple[str, str]:
    """Linear-size SQL for the Hilbert code as a chain of CTEs.

    Returns (cte_fragment, final_cte_name): the fragment defines CTEs
    ``h_s1 .. h_fin`` (the last one = src's columns + ``out_col``) and
    must be embedded in a WITH clause after ``src`` is defined.
    DuckDB dialect (xor(); & | << >> operators).
    """
    _check_level(level)
    sh = 16 - level
    steps: list[tuple[str, list[str]]] = []
    steps.append(
        (
            "h_s1",
            [
                f"((({x_col}) << {sh}) & 4294967295) AS hx",
                f"((({y_col}) << {sh}) & 4294967295) AS hy",
            ],
        )
    )
    steps.append(
        (
            "h_s2",
            [
                "xor(hx, hy) AS ra",
                "xor(65535, xor(hx, hy)) AS rb",
                "xor(65535, (hx | hy)) AS rc",
                "(hx & xor(hy, 65535)) AS rd",
            ],
        )
    )
    steps.append(
        (
            "h_s3",
            [
                "(ra | (rb >> 1)) AS qa",
                "xor((ra >> 1), ra) AS qb",
                "xor(xor((rc >> 1), (rb & (rd >> 1))), rc) AS qc",
                "xor(xor((ra & (rc >> 1)), (rd >> 1)), rd) AS qd",
            ],
        )
    )
    prev = ("qa", "qb", "qc", "qd")
    for rnd, s in ((2, 2), (3, 4)):
        a, b, c, d = prev
        na, nb, nc, nd = f"qa{rnd}", f"qb{rnd}", f"qc{rnd}", f"qd{rnd}"
        steps.append(
            (
                f"h_r{rnd}",
                [
                    f"xor(({a} & ({a} >> {s})), ({b} & ({b} >> {s}))) AS {na}",
                    f"xor(({a} & ({b} >> {s})), ({b} & (xor({a}, {b}) >> {s}))) AS {nb}",
                    f"xor({c}, xor(({a} & ({c} >> {s})), ({b} & ({d} >> {s})))) AS {nc}",
                    f"xor({d}, xor(({b} & ({c} >> {s})), (xor({a}, {b}) & ({d} >> {s})))) AS {nd}",
                ],
            )
        )
        prev = (na, nb, nc, nd)
    a, b, c, d = prev
    steps.append(
        (
            "h_r4",
            [
                f"xor({c}, xor(({a} & ({c} >> 8)), ({b} & ({d} >> 8)))) AS qc4",
                f"xor({d}, xor(({b} & ({c} >> 8)), (xor({a}, {b}) & ({d} >> 8)))) AS qd4",
            ],
        )
    )
    steps.append(
        (
            "h_fi",
            [
                "xor(qc4, (qc4 >> 1)) AS ffa",
                "xor(qd4, (qd4 >> 1)) AS ffb",
                "xor(hx, hy) AS fi0",
            ],
        )
    )
    steps.append(
        ("h_i1", ["(ffb | xor(65535, (fi0 | ffa))) AS fi1"])
    )
    # interleave fi0 and fi1, 4 masked steps each
    masks = [(8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765)]
    for tag in ("fi0", "fi1"):
        cur = tag
        for i, (s, m) in enumerate(masks):
            name = f"h_{tag}_{i}"
            col = f"{tag}_{i}"
            steps.append((name, [f"(({cur} | ({cur} << {s})) & {m}) AS {col}"]))
            cur = col
    steps.append(
        (
            "h_fin",
            [
                f"((((fi1_3 << 1) & 4294967295) | fi0_3) >> {32 - 2 * level}) AS {out_col}"
            ],
        )
    )
    frags = []
    prev_name = src
    for name, cols in steps:
        frags.append(
            f"{name} AS (SELECT *, {', '.join(cols)} FROM {prev_name})"
        )
        prev_name = name
    return ",\n".join(frags), prev_name


HILBERT_TEMP_COLS = (
    "hx, hy, ra, rb, rc, rd, qa, qb, qc, qd, qa2, qb2, qc2, qd2, "
    "qa3, qb3, qc3, qd3, qc4, qd4, ffa, ffb, fi0, fi1, "
    "fi0_0, fi0_1, fi0_2, fi0_3, fi1_0, fi1_1, fi1_2, fi1_3"
)


def _subst(expr: str, name: str, repl: str) -> str:
    """Whole-token textual substitution."""
    out = []
    i = 0
    n = len(name)
    while i < len(expr):
        j = expr.find(name, i)
        if j < 0:
            out.append(expr[i:])
            break
        before_ok = j == 0 or not (expr[j - 1].isalnum() or expr[j - 1] == "_")
        k = j + n
        after_ok = k >= len(expr) or not (expr[k].isalnum() or expr[k] == "_")
        if before_ok and after_ok:
            out.append(expr[i:j])
            out.append(repl)
            i = k
        else:
            out.append(expr[i : j + 1])
            i = j + 1
    return "".join(out)
