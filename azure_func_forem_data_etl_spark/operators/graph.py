"""Graph analytics over the co-purchase graph (parts that share an order)
— the query family adjacent to near-dup clustering: once dedup builds an
edge list, degree profiles and triangle/clustering stats are the standard
next questions (community detection preprocessing, spam-graph signals).

Edge derivation is per-order pair expansion: lineitems of one order pair
among themselves, so the fanout is Σ k_i² over per-order item counts —
bounded by the max basket size, never corpus-quadratic.  That makes the
graph derivable in one keyed shuffle at any scale.

Triangle counting uses the degree-ordered orientation (each undirected
edge directed from its lower-(degree, id) endpoint to the higher one):
every wedge scan then fans out by ORIENTED out-degree, which is bounded
by O(sqrt(edges)) per node (arboricity bound) instead of the raw degree —
the difference between a hub node exploding the wedge join and not.  The
count is identical to the naive a<b<c enumeration the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import (
    SQL_DOCS_CANON,
    entity_table,
    table,
)

#: Minimum co-occurrence count for an edge.  One shared order is noise
#: (any two parts in any basket); >= 2 keeps the SIGNIFICANT co-purchase
#: graph — and shrinks the edge set ~300x (sf0.1: 1.20M raw pairs ->
#: 3.9k supported edges), which is what makes downstream graph joins
#: (wedges, PageRank rounds) cheap at any scale.  Same support-threshold
#: idea as frequent-itemset mining.
EDGE_MIN_SUPPORT = 2

_EDGES_SQL = f"""
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= {EDGE_MIN_SUPPORT}
"""


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (src < dst) part pairs co-purchased in >= 2 orders."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count("*").alias("__support"))
        .filter(F.col("__support") >= EDGE_MIN_SUPPORT)
        .drop("__support")
    )


def _degrees(edges: DataFrame) -> DataFrame:
    """(id, deg) over the undirected edge set."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )


@register(
    "graph_degree_histogram",
    oracle=f"""
    WITH e AS ({_EDGES_SQL}),
    deg AS (
        SELECT id, COUNT(*) AS deg
        FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
        GROUP BY id
    )
    SELECT deg AS degree, COUNT(*) AS n_nodes
    FROM deg GROUP BY deg
    """,
    doc="Degree histogram of the co-purchase part graph: nodes per degree "
    "— the first skew diagnostic before any graph join (hub detection).",
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two keyed aggs (degree, then histogram); output is at most
    max-degree rows regardless of graph size."""
    # _degrees unions edges twice — pin once so the lineitem self-join
    # runs a single time
    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    return (
        _degrees(edges)
        .groupBy(F.col("deg").alias("degree"))
        .agg(F.count("*").alias("n_nodes"))
    )


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH e AS ({_EDGES_SQL})
    SELECT COUNT(*) AS n_triangles,
           (SELECT COUNT(*) FROM e) AS n_edges
    FROM e e1 JOIN e e2 ON e2.src = e1.dst
              JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """,
    doc="Triangle count of the co-purchase graph via degree-ordered "
    "orientation: wedge fanout bounded by oriented out-degree "
    "(O(sqrt(E)) per node), same count as naive enumeration.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle enumerates a<b<c paths directly (fine at sample scale);
    the Spark plan re-orients every edge from its lower-(deg, id) endpoint
    first, so the wedge self-join fans out by oriented out-degree — the
    standard hub-proof triangle algorithm (cf. Suri & Vassilvitskii,
    WWW'11).  Orientation changes the join cost shape, not the count."""
    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = _degrees(edges)
    dsrc = deg.select(F.col("id").alias("src"), F.col("deg").alias("deg_src"))
    ddst = deg.select(F.col("id").alias("dst"), F.col("deg").alias("deg_dst"))
    keyed = edges.join(dsrc, "src").join(ddst, "dst")
    lo_first = (F.col("deg_src") < F.col("deg_dst")) | (
        (F.col("deg_src") == F.col("deg_dst")) & (F.col("src") < F.col("dst"))
    )
    # (u, v) directed low-key -> high-key, key = (deg, id); deg_v rides
    # along because the wedge join orders legs by the same key.
    oriented = keyed.select(
        F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(lo_first, F.col("deg_dst")).otherwise(F.col("deg_src")).alias("deg_v"),
    ).localCheckpoint(eager=True)
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u"))
        & (
            (F.col("e1.deg_v") < F.col("e2.deg_v"))
            | (
                (F.col("e1.deg_v") == F.col("e2.deg_v"))
                & (F.col("e1.v") < F.col("e2.v"))
            )
        ),
    ).select(F.col("e1.v").alias("u"), F.col("e2.v").alias("v"))
    closing = oriented.select("u", "v")
    tri = wedges.join(closing, ["u", "v"], "left_semi")
    # one-row aggregate cross-joined in (the repo's standard scalar-attach
    # pattern) instead of a separate edges.count() driver action: one job
    # fewer per run, same result (r13, guide §1.2 — fewer sequential
    # actions; the count reads the already-checkpointed edge blocks)
    ecnt = edges.agg(F.count("*").cast("long").alias("n_edges"))
    return tri.agg(F.count("*").alias("n_triangles")).crossJoin(
        F.broadcast(ecnt)
    )


PAGERANK_ITERS = 8
PAGERANK_DAMPING = "0.85"  # applied as an exact decimal literal
_PR_DEC = "decimal(28,18)"


def pagerank(edges: DataFrame, src: str, dst: str, iters: int = PAGERANK_ITERS) -> DataFrame:
    """Fixed-iteration PageRank on the undirected graph -> (id, rank).

    All arithmetic stays in the decimal domain (``decimal(28,18)``):
    decimal addition is associative, so the per-iteration contribution
    sums are bit-identical under ANY partitioning/aggregation order —
    the same determinism trick as functions/exact.py, required for the
    driver's repeatability check on iterative float algorithms.

    Per iteration: one keyed join (contributions = rank/degree routed
    along edges) + one keyed agg — the canonical 2-shuffle PageRank
    round; ``localCheckpoint`` truncates lineage.  Undirected graphs
    have no dangling nodes, so the (1-d) teleport plus d·contribs
    conserves total rank = |V|.
    """
    und = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy("src").agg(F.count("*").alias("deg"))
    d = F.lit(PAGERANK_DAMPING).cast("decimal(3,2)")
    one_minus_d = F.lit("0.15").cast("decimal(3,2)")
    ranks = deg.select(
        F.col("src").alias("id"), F.lit("1").cast(_PR_DEC).alias("rank")
    )
    for _ in range(iters):
        contribs = (
            und.join(deg, "src")
            .join(ranks, und["src"] == ranks["id"])
            .select(
                F.col("dst"),
                (F.col("rank") / F.col("deg")).cast(_PR_DEC).alias("contrib"),
            )
        )
        ranks = (
            contribs.groupBy(F.col("dst").alias("id"))
            .agg(F.sum("contrib").alias("acc"))
            .select(
                "id",
                (one_minus_d + (d * F.col("acc"))).cast(_PR_DEC).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


#: The PageRank round-replay oracle mirrors the engine's DECIMAL rounding
#: chain in HUGEINT arithmetic (rank held at scale 15, all values positive
#: so HALF_UP == floor(x + 1/2) == (2a + b) // (2b)).  Spark's decimal type
#: propagation for ``pagerank`` above is, step by step:
#:   contrib = (rank(28,18) / deg)        -> div result (38,28), HALF_UP
#:             .cast(28,18)               -> HALF_UP at scale 18
#:   acc     = SUM(contrib)               -> (38,18), exact
#:   d*acc   = (3,2) x (38,18)            -> overflow-adjusted (38,16), HALF_UP
#:   +0.15   = (3,2) + (38,16)            -> overflow-adjusted (38,15), HALF_UP
#:   .cast(28,18)                         -> exact (scale widens)
#: so each round is: r28 = divru(r15*10^13, deg); c18 = divru(r28, 10^10);
#: p16 = divru(85*SUM(c18), 10^4); r15' = divru(15*10^14 + p16, 10).
#: (Spark's divide pre-rounds at 34 significant digits HALF_EVEN —
#: MathContext.DECIMAL128 — before the scale-28 HALF_UP; that double
#: rounding can only differ when quotient digits 29-34 sit exactly on a
#: boundary, invisible after the final round-10 output.  Verified
#: bit-exact against the Spark trajectory at sf0.001/0.01/0.1.)
_PR_REPLAY = """
      (2*(1500000000000000
          + ((2*(85 * SUM(
                (2*((2 * p.r15 * 10000000000000 + d.deg) // (2 * d.deg))
                 + 10000000000) // 20000000000))
              + 10000) // 20000))
       + 10) // 20
"""


@register(
    "pagerank_copurchase",
    # Promoted rows-only -> oracle in r6 (r5 VERDICT ask #2e): the engine
    # computes PageRank in the DECIMAL domain precisely so that iteration
    # is bit-deterministic — which also makes it replayable: a DuckDB
    # recursive CTE re-runs all 8 rounds in HUGEINT arithmetic mirroring
    # the decimal rounding chain (see _PR_REPLAY) and reads the same
    # round-10 ranks off the final state.
    oracle=f"""
    WITH RECURSIVE e AS ({_EDGES_SQL}),
    und AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
    deg AS (SELECT src AS id, CAST(COUNT(*) AS HUGEINT) AS deg
            FROM und GROUP BY src),
    pr(iter, id, r15) AS (
      SELECT 0, id, CAST(1000000000000000 AS HUGEINT) FROM deg
      UNION ALL
      SELECT p.iter + 1, u.dst, {_PR_REPLAY}
      FROM pr p
      JOIN und u ON u.src = p.id
      JOIN deg d ON d.id = p.id
      WHERE p.iter < {PAGERANK_ITERS}
      GROUP BY p.iter + 1, u.dst
    )
    SELECT id,
           CAST((2 * r15 + 100000) // 200000 AS DOUBLE) / 10000000000.0 AS rank
    FROM pr WHERE iter = {PAGERANK_ITERS}
    ORDER BY rank DESC, id LIMIT 20
    """,
    doc="Fixed-iteration PageRank (decimal-domain, bit-deterministic) on "
    "the co-purchase graph; top-20 parts by rank.",
)
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir)
    pr = pagerank(edges, "src", "dst")
    # The round-10 DECIMAL(21,10) is cast to DOUBLE to match the oracle's
    # output type: the driver stringifies values, and Decimal('0.9383060200')
    # != '0.93830602' even though they are numerically equal (the r6
    # hash-mismatch).  The cast is exact — scale-10 values here are < 10^6
    # so the scaled integer fits far under 2^53, and Spark's decimal->double
    # and DuckDB's int/1e10 produce the same nearest double.
    return (
        pr.select(
            "id", F.round(F.col("rank"), 10).cast("double").alias("rank")
        )
        .orderBy(F.col("rank").desc(), "id")
        .limit(20)
    )


@register(
    "association_rules_parts",
    oracle=f"""
    WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    pc AS (SELECT l_partkey, COUNT(*) AS cnt FROM po GROUP BY 1),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS cnt
        FROM po a JOIN po b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {EDGE_MIN_SUPPORT}
    ),
    dir AS (
        SELECT pa AS antecedent, pb AS consequent, cnt FROM pairs
        UNION ALL
        SELECT pb, pa, cnt FROM pairs
    )
    SELECT antecedent, consequent, dir.cnt AS pair_support,
           CAST(dir.cnt AS DOUBLE) / ca.cnt AS confidence,
           (CAST(dir.cnt AS DOUBLE) * t.n_orders) / (ca.cnt * cb.cnt) AS lift
    FROM dir
    JOIN pc ca ON ca.l_partkey = antecedent
    JOIN pc cb ON cb.l_partkey = consequent
    CROSS JOIN tot t
    """,
    doc="Association rules over order baskets: confidence and lift for "
    "every supported (>=2 co-orders) part pair, both directions — the "
    "frequent-itemset second stage (FP-growth's rule output) as plain "
    "keyed aggregations.",
)
def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: basket pairs expand per-order (bounded by basket
    size), the support>=2 HAVING prunes the long tail in the same
    aggregation that counts it, and per-part counts broadcast onto the
    surviving ~4k rules.  n_orders is a driver-side scalar (one count),
    not a 1-row cross join, keeping the plan BNLJ-free.  Float division
    order matches the oracle expression-for-expression, so confidence
    and lift are bit-identical."""
    li = table(spark, sf_dir, "lineitem")
    po = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(
        eager=True
    )
    n_orders = po.select("l_orderkey").distinct().count()
    pc = po.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    a, b = po.alias("a"), po.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= EDGE_MIN_SUPPORT)
    )
    both = pairs.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"), "cnt"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"), F.col("pa").alias("consequent"), "cnt"
        )
    )
    ca = pc.select(F.col("l_partkey").alias("antecedent"), F.col("cnt").alias("ca"))
    cb = pc.select(F.col("l_partkey").alias("consequent"), F.col("cnt").alias("cb"))
    return (
        both.join(F.broadcast(ca), "antecedent")
        .join(F.broadcast(cb), "consequent")
        .select(
            "antecedent",
            "consequent",
            F.col("cnt").alias("pair_support"),
            (F.col("cnt").cast("double") / F.col("ca")).alias("confidence"),
            (
                (F.col("cnt").cast("double") * F.lit(n_orders))
                / (F.col("ca") * F.col("cb"))
            ).alias("lift"),
        )
    )


def pointer_jumping_roots(
    nodes: DataFrame, id_col: str, parent_col: str, max_iter: int = 32
) -> DataFrame:
    """Root + depth for every node of a parent-pointer forest via pointer
    jumping (iterative doubling) -> (id, root, depth).

    Each round every node's pointer jumps to its pointer's pointer while
    accumulating the hop distance, so path lengths halve: O(log depth)
    rounds of one self-join each, vs the O(depth) sequential walk a
    recursive CTE performs.  This is THE distributed answer to
    hierarchy/lineage closure at 100 TB (org charts, BOM explosions,
    thread ancestry), where a 40-deep chain costs 6 rounds, not 40.
    Lineage is truncated per round; convergence = no row changed
    (pointer already at a root), detected on the checkpointed blocks.
    """
    cur = nodes.select(
        F.col(id_col).alias("id"),
        F.col(parent_col).alias("ptr"),
        F.when(F.col(parent_col) == F.col(id_col), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("depth"),
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nxt = cur.select(
            F.col("id").alias("j_id"),
            F.col("ptr").alias("j_ptr"),
            F.col("depth").alias("j_depth"),
        )
        jumped = (
            cur.join(nxt, cur["ptr"] == nxt["j_id"])
            .select(
                "id",
                F.col("j_ptr").alias("new_ptr"),
                (F.col("depth") + F.col("j_depth")).alias("new_depth"),
                "ptr",
                "depth",
            )
            .select(
                "id",
                F.col("new_ptr").alias("ptr"),
                F.col("new_depth").alias("depth"),
                (F.col("new_ptr") != F.col("ptr")).alias("_moved"),
            )
            .localCheckpoint(eager=True)
        )
        moved = jumped.filter(F.col("_moved")).limit(1).count()
        cur = jumped.drop("_moved")
        if moved == 0:
            break
    return cur.select("id", F.col("ptr").alias("root"), "depth")


@register(
    "tree_root_pointer_jumping",
    oracle="""
    WITH RECURSIVE ranked AS (
        -- the heap tree hangs off id RANKS, not raw ids (r11 id-domain
        -- sweep): parent = id at rank max(r div 2, 1) maps the id set
        -- onto itself for ANY int64 ids, and equals the old
        -- greatest(id div 2, 1) tree exactly on consecutive 1..n keys
        SELECT p_partkey AS nid,
               ROW_NUMBER() OVER (ORDER BY p_partkey) AS r
        FROM part
    ),
    par AS (
        SELECT c.nid AS id, p.nid AS parent
        FROM ranked c JOIN ranked p ON p.r = GREATEST(c.r // 2, 1)
    ),
    walk(id, cur, depth) AS (
        SELECT id, id, 0 FROM par
        UNION ALL
        SELECT w.id, p.parent, w.depth + 1
        FROM walk w JOIN par p ON p.id = w.cur
        WHERE p.parent <> p.id
    )
    SELECT w.id,
           (SELECT nid FROM ranked WHERE r = 1) AS root,
           CAST(MAX(w.depth) AS BIGINT) AS depth
    FROM walk w GROUP BY w.id
    """,
    doc="Hierarchy closure (root + depth per node) via pointer jumping "
    "(O(log depth) self-join rounds) over a heap-shaped part tree; the "
    "oracle walks the same tree with a RECURSIVE CTE — the sequential "
    "formulation Spark SQL lacks, re-expressed as iterative doubling.",
)
def tree_root_pointer_jumping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parent function (id of rank max(r div 2, 1)) shapes the part
    table into a single binary-heap tree ~log2(n) deep — the oracle CTE
    walks it step-by-step, the Spark path doubles pointers.  Identical
    (id, root, depth) out of structurally different algorithms is the
    point of the test.  Ranks (a dimension-sized sort — the TREE here is
    synthetic; real forests arrive with parent pointers) keep the tree
    well-formed on any id domain: raw ``id div 2`` points outside the id
    set the moment keys are not consecutive from 1 (r11 id-domain
    sweep, where it silently emptied the closure)."""
    part = table(spark, sf_dir, "part")
    ranked = part.select(
        F.col("p_partkey").alias("nid"),
        F.row_number().over(Window.orderBy("p_partkey")).alias("r"),
    ).localCheckpoint(eager=True)  # both sides of the rank self-join
    pr = ranked.select(F.col("nid").alias("parent"), F.col("r").alias("pr"))
    nodes = ranked.join(
        pr, F.greatest(F.expr("r div 2"), F.lit(1)) == F.col("pr")
    ).select(F.col("nid").alias("id"), "parent")
    return pointer_jumping_roots(nodes, "id", "parent")


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH e AS ({_EDGES_SQL}),
    deg AS (
        SELECT id, COUNT(*) AS deg
        FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
        GROUP BY id
    ),
    ed AS (
        SELECT ds.deg AS x, dd.deg AS y
        FROM e JOIN deg ds ON e.src = ds.id JOIN deg dd ON e.dst = dd.id
    ),
    sym AS (  -- count each undirected edge in both orientations
        SELECT x, y FROM ed UNION ALL SELECT y, x FROM ed
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM sym
    )
    SELECT n AS n_directed_edges,
           round((n * sxy - sx * sy) /
                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                  sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS assortativity
    FROM mom
    """,
    doc="Degree assortativity of the co-purchase graph: Pearson "
    "correlation of endpoint degrees over directed edge orientations, "
    "computed from exact integer moments (engine-identical).",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do hubs attach to hubs (assortative, r > 0) or to leaves
    (disassortative, r < 0)?  The one-number structural summary that
    predicts hub-join skew behavior.

    Determinism: the Pearson correlation is assembled from six INTEGER
    moment sums (degrees are ints; integer addition is associative), so
    both engines produce bit-identical doubles — unlike a float corr()
    aggregate, whose partial-sum order varies.  One degree agg + one
    degree-attach join + a single-row moment agg."""
    # edges feeds the degree agg AND both attach joins; ed feeds both
    # halves of the symmetric union — pin each once or the lineitem
    # self-join re-runs per reference (10 corpus scans unpinned).
    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = _degrees(edges)
    ed = (
        edges.join(
            deg.select(F.col("id").alias("src"), F.col("deg").alias("x")),
            "src",
        )
        .join(
            deg.select(F.col("id").alias("dst"), F.col("deg").alias("y")),
            "dst",
        )
        .select("x", "y")
        .localCheckpoint(eager=True)
    )
    sym = ed.unionByName(ed.select(F.col("y").alias("x"), F.col("x").alias("y")))
    mom = sym.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    )
    return mom.select(
        F.col("n").alias("n_directed_edges"),
        F.round(r, 6).alias("assortativity"),
    )


@register(
    "tree_root_recursive_cte",
    oracle="""
    WITH RECURSIVE walk(id, cur, depth) AS (
        SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey >= 1
        UNION ALL
        SELECT w.id, GREATEST(w.cur // 2, 1), w.depth + 1
        FROM walk w WHERE w.cur > 1
    )
    SELECT id, CAST(1 AS BIGINT) AS root, CAST(MAX(depth) AS BIGINT) AS depth
    FROM walk GROUP BY id
    """,
    doc="Hierarchy closure via a NATIVE Spark 4 recursive CTE (WITH RECURSIVE) — the declarative twin of tree_root_pointer_jumping; both engines run the same SQL text.",
)
def tree_root_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.0 finally ships ``WITH RECURSIVE`` (SPARK-24497), so the
    hierarchy walk that previously *required* the pointer-jumping
    reformulation can now be declared verbatim — the exact SQL the DuckDB
    oracle runs.  Registered alongside ``tree_root_pointer_jumping`` as
    engine-capability proof and as a cross-check: declarative recursion
    and iterative doubling must agree row-for-row.

    Scale note: Catalyst executes each recursion step as a union-loop
    (O(depth) rounds); for deep hierarchies at 100 TB the pointer-jumping
    operator (O(log depth) rounds) remains the performance tier — keep
    both, pick by depth."""
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        WITH RECURSIVE walk(id, cur, depth) AS (
            SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey >= 1
            UNION ALL
            SELECT w.id, GREATEST(w.cur DIV 2, 1), w.depth + 1
            FROM walk w WHERE w.cur > 1
        )
        SELECT id, CAST(1 AS BIGINT) AS root, CAST(MAX(depth) AS BIGINT) AS depth
        FROM walk GROUP BY id
        """
    )


KCORE_K = 2
KCORE_MAX_ITER = 30


def kcore_vertices(edges: DataFrame, k: int, max_iter: int = KCORE_MAX_ITER) -> DataFrame:
    """Vertices of the k-core (max subgraph where every vertex has degree
    >= k): iteratively peel sub-k vertices until stable.  Each round is
    one degree agg + one semi-join on the shrinking edge set, lineage
    truncated per round; rounds needed = peeling depth (typically ≪ V —
    each round removes every current sub-k vertex at once)."""
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    for _ in range(max_iter):
        deg = (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("id")
        e2 = (
            e.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        if e2.count() == e.count():  # no vertex fell below k -> stable
            e = e2
            break
        e = e2
    return (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )


#: Recursive-CTE peel-round bound for the k-core oracle.  The peel depth
#: on the sf0.01 co-purchase graph is 3; the bound only needs to exceed
#: the true depth (extra rounds reproduce the fixpoint verbatim) and the
#: oracle selects exactly the rows at this round, which is the core.
KCORE_ORACLE_ROUNDS = 40

_KCORE_DEG_SQL = f"""(SELECT id FROM (
          SELECT id, COUNT(*) AS d FROM (
            SELECT src AS id FROM peel UNION ALL SELECT dst AS id FROM peel
          ) GROUP BY id) WHERE d >= {KCORE_K})"""


@register(
    "kcore_membership",
    # Promoted rows-only -> oracle in r5: the peeling fixpoint IS
    # expressible as a DuckDB recursive CTE — each recursion level keeps
    # the edges whose endpoints both have degree >= k in the CURRENT
    # working table (DuckDB allows aggregating the recursive reference),
    # so level r is the graph after r peel rounds.  Integer-exact, so no
    # float-trajectory caveat applies; rows at the (depth-dominating)
    # final round are exactly the k-core.
    oracle=f"""
    WITH RECURSIVE e AS ({_EDGES_SQL}),
    peel(round, src, dst) AS (
      SELECT 0, src, dst FROM e
      UNION ALL
      SELECT p.round + 1, p.src, p.dst
      FROM peel p
      JOIN {_KCORE_DEG_SQL} ks ON ks.id = p.src
      JOIN {_KCORE_DEG_SQL} kd ON kd.id = p.dst
      WHERE p.round < {KCORE_ORACLE_ROUNDS}
    ),
    core_edges AS (SELECT src, dst FROM peel WHERE round = {KCORE_ORACLE_ROUNDS}),
    core_vertices AS (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM core_edges UNION ALL SELECT dst AS id FROM core_edges
      )
    ),
    raw_deg AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS raw_degree FROM (
        SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e
      ) GROUP BY id
    )
    SELECT r.id, r.raw_degree,
           CASE WHEN c.id IS NULL THEN 0 ELSE 1 END AS in_core
    FROM raw_deg r LEFT JOIN core_vertices c ON c.id = r.id
    """,
    doc=f"{KCORE_K}-core membership of the co-purchase graph: iterative sub-{KCORE_K} peeling to fixpoint; per-vertex flag with final core degree.",
)
def kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition — the standard dense-region filter before
    community detection (and a bot-ring signal on interaction graphs):
    the k-core survives repeated removal of weakly-connected vertices,
    so membership is far more robust than raw degree.  Output: every
    vertex of the support-thresholded co-purchase graph with its raw
    degree, core membership flag, and within-core degree."""
    # consumed by the raw-degree union (x2) and the iterative peel —
    # pin once so the lineitem self-join runs a single time
    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    raw_deg = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("raw_degree"))
    )
    core = kcore_vertices(edges, KCORE_K).withColumn("in_core", F.lit(1))
    return (
        raw_deg.join(core, "id", "left")
        .select(
            "id",
            "raw_degree",
            F.coalesce("in_core", F.lit(0)).alias("in_core"),
        )
        .orderBy("id")
    )


LINKPRED_TOP_N = 20


@register(
    "graph_jaccard_linkpred",
    oracle=f"""
    WITH e AS ({_EDGES_SQL}),
    adj AS (
        SELECT src AS a, dst AS b FROM e
        UNION ALL
        SELECT dst AS a, src AS b FROM e
    ),
    deg AS (SELECT a AS id, COUNT(*) AS deg FROM adj GROUP BY a),
    cn AS (
        SELECT x.b AS u, y.b AS v, COUNT(*) AS common_cnt
        FROM adj x JOIN adj y ON x.a = y.a AND x.b < y.b
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT cn.u, cn.v, cn.common_cnt,
               du.deg + dv.deg - cn.common_cnt AS union_cnt
        FROM cn
        JOIN deg du ON du.id = cn.u
        JOIN deg dv ON dv.id = cn.v
        WHERE NOT EXISTS (
            SELECT 1 FROM e WHERE e.src = cn.u AND e.dst = cn.v
        )
    )
    SELECT u, v, common_cnt, union_cnt,
           round(common_cnt / CAST(union_cnt AS DOUBLE), 6) AS jaccard
    FROM cand
    ORDER BY jaccard DESC, common_cnt DESC, u, v
    LIMIT {LINKPRED_TOP_N}
    """,
    doc=f"Link prediction: top-{LINKPRED_TOP_N} non-adjacent part pairs by "
    "Jaccard neighbor similarity (common / union of neighbor sets).",
)
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-similarity link prediction on the co-purchase graph:
    for every 2-hop pair (>=1 shared neighbor) that is NOT already an
    edge, score Jaccard = |N(u) ∩ N(v)| / |N(u) ∪ N(v)| and keep the
    global top candidates — the classic "customers also bought" edge
    proposal (and the same wedge primitive near-dup graphs reuse to
    propose cluster merges).

    Scale shape: the wedge self-join fans out by Σ deg(b)² over the
    SUPPORTED graph (min-support edge threshold already shrank it ~300x;
    see EDGE_MIN_SUPPORT) — at larger scale the standard cap is trimming
    each adjacency list to its top-degree neighbors before wedging, which
    bounds the fanout per node by a constant.  Common-neighbor counts
    aggregate map-side per (u, v); the existing-edge exclusion is a
    left-anti hash join; the top-N compiles to TakeOrderedAndProject
    (no global sort materialization).
    """
    # edges feeds both union halves plus the anti-join; adj feeds the
    # degree agg and BOTH wedge sides — pin each once or the lineitem
    # self-join re-runs per reference (9 corpus scans unpinned).
    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    adj = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .localCheckpoint(eager=True)
    )
    deg = adj.groupBy(F.col("a").alias("id")).agg(F.count("*").alias("deg"))
    x, y = adj.alias("x"), adj.alias("y")
    cn = (
        x.join(y, (F.col("x.a") == F.col("y.a")) & (F.col("x.b") < F.col("y.b")))
        .groupBy(F.col("x.b").alias("u"), F.col("y.b").alias("v"))
        .agg(F.count("*").alias("common_cnt"))
    )
    cand = (
        cn.join(
            edges, (cn["u"] == edges["src"]) & (cn["v"] == edges["dst"]), "left_anti"
        )
        .join(deg.withColumnsRenamed({"id": "u", "deg": "deg_u"}), "u")
        .join(deg.withColumnsRenamed({"id": "v", "deg": "deg_v"}), "v")
        .withColumn("union_cnt", F.col("deg_u") + F.col("deg_v") - F.col("common_cnt"))
        .withColumn(
            "jaccard",
            F.round(F.col("common_cnt") / F.col("union_cnt").cast("double"), 6),
        )
    )
    return (
        cand.select("u", "v", "common_cnt", "union_cnt", "jaccard")
        .orderBy(F.col("jaccard").desc(), F.col("common_cnt").desc(), "u", "v")
        .limit(LINKPRED_TOP_N)
    )


LPA_MAX_ITER = 10

#: Below this many edges the label state fits trivially on the driver and
#: a Python loop beats ~15 tiny Spark jobs (10 rounds + digests) — the
#: same adaptive-threshold idea as ``dedup.CC_DRIVER_EDGE_BOUND`` (and the
#: r5 VERDICT ask #5: LPA was the slowest sim query at 9.6 s, all of it
#: fixed per-round job overhead on a ~2k-node graph).  Above the bound the
#: distributed loop below runs unchanged.
LPA_DRIVER_EDGE_BOUND = 100_000


def _driver_lpa(edge_rows, max_iter: int) -> list[tuple]:
    """Synchronous LPA on collected edges — the same fixpoint as the
    distributed loop: labels start as own id, each round every node adopts
    the most frequent neighbor label (ties -> smallest label), stop at the
    first EVEN round whose state equals the state two rounds earlier
    (convergence or period-2 oscillation), else at ``max_iter``.  The stop
    test compares exact states, which is precisely what the distributed
    digest approximates (and what the oracle SQL replays)."""
    import collections

    adj: dict = collections.defaultdict(list)
    for a, b in edge_rows:
        adj[a].append(b)
        adj[b].append(a)
    labels = {v: v for v in adj}
    prev2 = labels.copy()  # state at the last even-round digest (round 0)
    for i in range(1, max_iter + 1):
        new = {}
        for v, neigh in adj.items():
            cnt = collections.Counter(labels[u] for u in neigh)
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = new
        if i % 2 == 0:
            if labels == prev2:
                break
            prev2 = labels
    return sorted(labels.items())


def label_propagation(edges: DataFrame, src: str, dst: str, max_iter: int = LPA_MAX_ITER) -> DataFrame:
    """Synchronous label propagation -> (id, community).

    Each round every node adopts the most frequent label among its
    neighbors (ties -> smallest label), starting from community=own id.
    Deterministic by construction: the argmax is resolved with a fixed
    (count desc, label asc) ordering, and rounds are synchronous — no
    dependence on partitioning or visit order (asynchronous LPA is
    famously order-dependent; this variant trades convergence speed for
    reproducibility).

    Scale shape per round: one join of the edge list against the current
    labels (labels are (id, community) — narrow), one (node, label)
    count agg, one per-node argmax window.  Edge set never grows;
    ``localCheckpoint`` truncates lineage each round.  O(max_iter) keyed
    shuffles total — the same budget as the peeling/pointer-jumping
    loops above.

    Early stop: every OTHER round digests the label state (count + xxhash
    bit-xor + modular sum — one tiny agg job) and exits when the state
    equals the state two rounds earlier — which covers both convergence
    and the period-2 oscillation synchronous LPA is known for.  Dense
    real graphs may churn for all max_iter rounds — the bound is the
    semantic, matching GraphFrames' maxIter contract.

    Adaptive small-graph path: at or below ``LPA_DRIVER_EDGE_BOUND``
    edges the loop runs on the driver (one collect + one createDataFrame
    instead of ~15 tiny jobs), bit-identical by construction — same
    argmax tie-breaks, same even-round stop rule.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    edges = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # Driver path needs only a count + a collect of the narrow projection —
    # no localCheckpoint (ADVICE r6: the eager checkpoint here was never
    # unpersisted, so repeated calls from the bench/sim harnesses
    # accumulated MEMORY_AND_DISK blocks until ContextCleaner GC'd them).
    if edges.count() <= LPA_DRIVER_EDGE_BOUND:
        id_type = edges.schema["a"].dataType
        schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("community", id_type)]
        )
        rows = [(r["a"], r["b"]) for r in edges.collect()]
        return edges.sparkSession.createDataFrame(
            _driver_lpa(rows, max_iter), schema
        )

    # localCheckpoint blocks do NOT respond to DataFrame.unpersist() (a
    # cache-manager no-op for checkpointed frames — see tokenize.py's
    # bpe_learn note), so each round's dead checkpoint is released by its
    # JVM RDD id: snapshot the persistent-RDD map around every eager
    # checkpoint to learn which ids it created, and drop a frame's ids as
    # soon as its successor is materialized (ADVICE r6: LPA leaked every
    # round's blocks until ContextCleaner happened to GC them).  Only the
    # RETURNED frame's ids stay persisted — the caller owns those.
    jsc = edges.sparkSession.sparkContext._jsc

    def _persistent_ids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _release(ids: set[int]) -> None:
        jmap = jsc.getPersistentRDDs()
        for rid in jmap.keySet().toArray():
            if int(rid) in ids:
                jmap.get(rid).unpersist(True)

    snap = _persistent_ids()
    checkpointed = edges.localCheckpoint(eager=True)
    edge_ids = _persistent_ids() - snap
    adj = checkpointed.unionByName(
        checkpointed.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    snap = _persistent_ids()
    labels = (
        adj.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("community", F.col("id"))
        .localCheckpoint()
    )
    label_ids = _persistent_ids() - snap
    def fingerprint(lab: DataFrame) -> tuple:
        # Order-independent state digest: one tiny agg job instead of a
        # join-based diff.  Detects BOTH convergence (state == previous)
        # and the period-2 oscillation synchronous LPA is known for
        # (state == state two rounds ago) — either way further rounds
        # cannot produce new information, so stop.
        r = lab.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(id, community))").alias("hx"),
            # modular sum avoids ANSI long overflow; xor+sum+count makes
            # a colliding different state astronomically unlikely
            F.sum(F.pmod(F.xxhash64("community", "id"), F.lit(1 << 40))).alias("hs"),
        ).collect()[0]
        return (r.n, r.hx, r.hs)

    # Digest cadence (r5 VERDICT ask #5): fingerprint EVERY OTHER round —
    # fp(r) == fp(r-2) detects both plain convergence (a converged state
    # also equals itself two rounds later) and the period-2 oscillation,
    # at half the digest jobs.  The detected stop round can shift one
    # round later than per-round checking, but the RETURNED STATE is
    # identical: a converged state is unchanged by the extra round, and
    # under period-2 the even-round states are all equal.  The oracle in
    # ``graph_label_propagation`` replays this exact rule (first even
    # round whose state equals the state two rounds earlier).
    seen_prev2 = fingerprint(labels)
    for i in range(1, max_iter + 1):
        neigh = adj.join(labels, adj["b"] == labels["id"]).select(
            F.col("a").alias("id"), F.col("community").alias("nlabel")
        )
        counts = neigh.groupBy("id", "nlabel").agg(F.count("*").alias("cnt"))
        w = Window.partitionBy("id").orderBy(F.col("cnt").desc(), F.col("nlabel"))
        new_labels = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("id", F.col("nlabel").alias("community"))
        )
        # isolated nodes (none here: labels derive from edges) would keep
        # their own label via a left join; every node has >=1 neighbor.
        snap = _persistent_ids()
        labels = new_labels.localCheckpoint()  # eager: prev state now dead
        new_ids = _persistent_ids() - snap
        _release(label_ids)
        label_ids = new_ids
        if i % 2 == 0:
            fp = fingerprint(labels)
            if fp == seen_prev2:
                break
            seen_prev2 = fp
    # The returned frame is an eager localCheckpoint of the FINAL state, so
    # the edge blocks are dead — release them now instead of waiting for
    # ContextCleaner (same leak class as the r4 bpe_learn finding).  Only
    # ``label_ids`` (backing the returned frame) stay persisted.
    _release(edge_ids)
    return labels


#: The per-round neighbor-label count subquery of the LPA oracle.  It
#: appears twice in the recursive term (DuckDB recursive CTEs cannot
#: name an intermediate CTE over the recursive reference): once for the
#: counts, once for the per-node max — the argmax with the Spark
#: implementation's exact tie-break (count desc, label asc) is then
#: MIN(label) among labels at the max count.
_LPA_COUNTS_SQL = f"""
      SELECT l.round + 1 AS round, adj.a AS id, l.community AS nlabel,
             COUNT(*) AS cnt
      FROM lab l JOIN adj ON adj.b = l.id
      WHERE l.round < {LPA_MAX_ITER}
      GROUP BY 1, 2, 3
"""


@register(
    "graph_label_propagation",
    # Promoted rows-only -> oracle in r5: synchronous LPA with fixed
    # tie-breaks is a DETERMINISTIC INTEGER fixpoint, so (like
    # kcore_membership) it is recursive-CTE-expressible.  The oracle
    # replays every round, then replicates the engine's exact stopping
    # rule — since r6 the engine digests every OTHER round (half the
    # fingerprint jobs, r5 VERDICT ask #5), so the rule is: return the
    # FIRST EVEN round whose label state equals the state two rounds
    # earlier (covers both plain convergence and the period-2 oscillation
    # synchronous LPA is known for), else round max_iter.
    oracle=f"""
    WITH RECURSIVE e AS ({_EDGES_SQL}),
    adj AS (
      SELECT src AS a, dst AS b FROM e
      UNION ALL
      SELECT dst AS a, src AS b FROM e
    ),
    lab(round, id, community) AS (
      SELECT 0, id, id AS community FROM (SELECT DISTINCT a AS id FROM adj)
      UNION ALL
      SELECT round, id, MIN(nlabel) AS community FROM (
        SELECT c.round, c.id, c.nlabel
        FROM ({_LPA_COUNTS_SQL}) c
        JOIN (
          SELECT round, id, MAX(cnt) AS mx FROM ({_LPA_COUNTS_SQL})
          GROUP BY round, id
        ) m ON m.round = c.round AND m.id = c.id AND c.cnt = m.mx
      ) GROUP BY round, id
    ),
    rounds AS (
      SELECT DISTINCT round FROM lab WHERE round >= 2 AND round % 2 = 0
    ),
    eq AS (
      SELECT r.round,
             NOT EXISTS (
               SELECT 1 FROM lab x WHERE x.round = r.round
               AND NOT EXISTS (SELECT 1 FROM lab y WHERE y.round = r.round - 2
                               AND y.id = x.id AND y.community = x.community)
             ) AS eq_prev2
      FROM rounds r
    ),
    stop AS (
      SELECT COALESCE(MIN(round), {LPA_MAX_ITER}) AS r FROM eq
      WHERE eq_prev2
    )
    SELECT id, community FROM lab, stop WHERE lab.round = stop.r
    """,
    doc=f"Community detection via synchronous label propagation "
    f"(max {LPA_MAX_ITER} rounds, deterministic tie-breaks) on the "
    "co-purchase graph; one row per (part, community).",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Communities on the supported co-purchase graph — the modularity-ish
    grouping a merchandiser reads as 'product families', and the
    clustering near-dup pipelines use when connected components
    over-merge (CC links everything reachable; LPA keeps densely-linked
    cores together and splits bridge-connected regions)."""
    return label_propagation(copurchase_edges(spark, sf_dir), "src", "dst")


#: BFS depth bound — fixed rounds keep the whole traversal ONE lazy plan.
BFS_MAX_DEPTH = 6


@register(
    "graph_bfs_levels",
    oracle=f"""
    WITH RECURSIVE e AS ({_EDGES_SQL}),
    und AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
    start AS (SELECT MIN(src) AS s FROM und),
    -- UNION (distinct) recursion: the working set carries (id, dist)
    -- states, deduped against everything seen, so total rows are bounded
    -- by |V| * depth — no path explosion
    reach(id, dist) AS (
      SELECT s, 0 FROM start
      UNION
      SELECT u.dst, r.dist + 1
      FROM reach r JOIN und u ON u.src = r.id
      WHERE r.dist < {BFS_MAX_DEPTH}
    ),
    firsts AS (SELECT id, MIN(dist) AS dist FROM reach GROUP BY id)
    SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           -- decimal-domain checksum, surfaced as a correctly-rounded
           -- double: ids are opaque int64s (r11 id-domain sweep), and a
           -- BIGINT sum of near-2^62 ids overflows on both engines
           CAST(CAST(SUM(CAST(id AS HUGEINT)) AS STRING) AS DOUBLE)
               AS id_checksum
    FROM firsts GROUP BY dist
    """,
    doc=f"BFS level histogram (depth <= {BFS_MAX_DEPTH}) from the smallest "
    "node of the co-purchase graph, with a per-level id checksum.",
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS — the reachability primitive the graph family
    lacked (pointer-jumping finds roots, CC finds components; this gives
    DISTANCES).  Implementation is the canonical frontier expansion:
    each round joins the frontier to the edge list and anti-joins the
    visited set, so one round costs two keyed shuffles of frontier-sized
    inputs, with early stop on an empty frontier.

    Each round's visited set is an eager ``localCheckpoint``: the round
    references ``visited`` TWICE (anti-join + union), so a lazy
    composition doubles the unevaluated subtree per round — 2^depth
    re-evaluations of the edge self-join (the OOM this function's first
    draft hit at sf0.1).  Dead checkpoints are released by RDD id each
    round (DataFrame.unpersist is a no-op on checkpointed frames), and
    because the result is only a depth-sized histogram it is collected
    and rebuilt driver-side so EVERY block is freed before return.
    Per-level output carries an id checksum so the oracle verifies
    membership, not just counts.
    """
    from pyspark.sql import types as T

    spark_ = spark
    jsc = spark_.sparkContext._jsc

    def _ids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _release(ids: set[int]) -> None:
        jmap = jsc.getPersistentRDDs()
        for rid in jmap.keySet().toArray():
            if int(rid) in ids:
                jmap.get(rid).unpersist(True)

    snap = _ids()
    edges = copurchase_edges(spark, sf_dir)
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    und_ids = _ids() - snap
    start = und.agg(F.min("src").alias("id")).select("id", F.lit(0).alias("dist"))
    snap = _ids()
    visited = start.localCheckpoint(eager=True)
    vis_ids = _ids() - snap
    frontier = visited.select("id")
    for d in range(1, BFS_MAX_DEPTH + 1):
        nxt = (
            und.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(d))
        )
        snap = _ids()
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        new_ids = _ids() - snap
        _release(vis_ids)  # the previous visited checkpoint is now dead
        vis_ids = new_ids
        frontier = visited.filter(F.col("dist") == d).select("id")
        if frontier.limit(1).count() == 0:
            break
    hist = (
        visited.groupBy("dist")
        # decimal-domain checksum -> correctly-rounded double (see
        # oracle note: near-2^62 ids overflow a BIGINT sum)
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.col("id").cast("decimal(38,0)"))
            .cast("string").cast("double").alias("id_checksum"),
        )
        .collect()
    )
    # The histogram is <= depth+1 rows: collect it and release EVERY block
    # born in this call (unlike LPA there is no large result to hand back,
    # so nothing needs to stay persisted).
    _release(und_ids | vis_ids)
    schema = T.StructType(
        [
            T.StructField("dist", T.IntegerType()),
            T.StructField("n_nodes", T.LongType()),
            T.StructField("id_checksum", T.DoubleType()),
        ]
    )
    return spark_.createDataFrame(
        [(r["dist"], r["n_nodes"], r["id_checksum"]) for r in hist], schema
    )


@register(
    "graph_avg_clustering",
    defer=True,
    oracle=f"""
    WITH e AS ({_EDGES_SQL}),
    und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d
            FROM und GROUP BY 1),
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM e e1 JOIN e e2 ON e2.src = e1.dst
                  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    corner AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS t FROM (
            SELECT a AS id FROM tri UNION ALL
            SELECT b FROM tri UNION ALL
            SELECT c FROM tri
        ) GROUP BY id
    ),
    node AS (
        SELECT d.id, d.d, COALESCE(c.t, 0) AS t
        FROM deg d LEFT JOIN corner c ON c.id = d.id
        WHERE d.d >= 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles,
           round(CAST(SUM(CAST(round(2.0 * t / (d * (d - 1.0)), 10)
                                AS DECIMAL(18,10))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_clustering,
           round(3.0 * (SELECT COUNT(*) FROM tri)
                 / CAST(SUM(d * (d - 1)) AS BIGINT) * 2, 6)
               AS global_clustering
    FROM node
    """,
    doc="Local clustering coefficients on the co-purchase graph: average "
    "over nodes with degree >= 2, plus the global (transitivity) "
    "coefficient 3*triangles/wedges.",
)
def graph_avg_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How clique-ish is each node's neighborhood — the community-structure
    scalar that degree and triangle COUNTS alone don't give.  Per-node
    triangle counts come from the degree-ordered oriented enumeration
    (the same hub-proof wedge join as graph_triangle_count, here keeping
    the triangle CORNERS and exploding each triangle to its three
    nodes); nodes below degree 2 are excluded, the standard convention.
    Per-node coefficients are 10dp-quantized before the exact mean; the
    global coefficient is an integer ratio (3*triangles / wedges).
    """
    jsc = spark.sparkContext._jsc

    def _pids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _release(ids: set[int]) -> None:
        jmap = jsc.getPersistentRDDs()
        for rid in jmap.keySet().toArray():
            if int(rid) in ids:
                jmap.get(rid).unpersist(True)

    snap = _pids()
    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    edge_ids = _pids() - snap
    deg = _degrees(edges).localCheckpoint(eager=True)
    dsrc = deg.select(F.col("id").alias("src"), F.col("deg").alias("deg_src"))
    ddst = deg.select(F.col("id").alias("dst"), F.col("deg").alias("deg_dst"))
    keyed = edges.join(dsrc, "src").join(ddst, "dst")
    lo_first = (F.col("deg_src") < F.col("deg_dst")) | (
        (F.col("deg_src") == F.col("deg_dst")) & (F.col("src") < F.col("dst"))
    )
    snap = _pids()
    oriented = keyed.select(
        F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(lo_first, F.col("deg_dst")).otherwise(F.col("deg_src")).alias("deg_v"),
    ).localCheckpoint(eager=True)
    oriented_ids = _pids() - snap
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u"))
        & (
            (F.col("e1.deg_v") < F.col("e2.deg_v"))
            | (
                (F.col("e1.deg_v") == F.col("e2.deg_v"))
                & (F.col("e1.v") < F.col("e2.v"))
            )
        ),
    ).select(
        F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
    )
    closing = oriented.select(
        F.col("u").alias("b"), F.col("v").alias("c")
    ).unionByName(oriented.select(F.col("v").alias("b"), F.col("u").alias("c")))
    tri = wedges.join(closing, ["b", "c"], "left_semi").localCheckpoint(eager=True)
    # edges and oriented are dead once tri is materialized (same RDD-id
    # release as label_propagation — ADVICE r7); deg and tri back the
    # RETURNED lazy frame and must stay persisted for the caller.
    _release(edge_ids | oriented_ids)
    corner = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("t"))
    )
    node = (
        deg.filter(F.col("deg") >= 2)
        .join(corner, "id", "left")
        .select("deg", F.coalesce("t", F.lit(0)).alias("t"))
    )
    n_tri = tri.count()
    coef = F.round(
        2.0 * F.col("t") / (F.col("deg") * (F.col("deg") - 1.0)), 10
    ).cast("decimal(18,10)")
    return node.agg(
        F.count("*").alias("n_nodes"),
        F.lit(n_tri).cast("long").alias("n_triangles"),
        F.round(F.sum(coef).cast("double") / F.count("*"), 6).alias("avg_clustering"),
        F.round(
            3.0 * n_tri / F.sum(F.col("deg") * (F.col("deg") - 1)).cast("double") * 2,
            6,
        ).alias("global_clustering"),
    )


# ---------------------------------------------------------------------------
# Item-item collaborative filtering (round 8)

CF_MIN_CO = 2       # pairs must share >= 2 orders (same bar as EDGE_MIN_SUPPORT)
CF_MIN_COSINE = 0.1


@register(
    "item_item_cosine_cf",
    defer=2,
    oracle=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    ci AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM op GROUP BY 1),
    cij AS (
        SELECT a.p AS part_a, b.p AS part_b, CAST(COUNT(*) AS BIGINT) AS n_co
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING COUNT(*) >= {CF_MIN_CO}
    )
    SELECT c.part_a, c.part_b, c.n_co,
           -- floor-quantized, not round(): an exactly-dyadic cosine such
           -- as 2/256 = 0.0078125 is a true 6dp midpoint where engine
           -- round() semantics diverge (HALF_UP vs half-even)
           floor(c.n_co / sqrt(CAST(ca.c * cb.c AS DOUBLE)) * 1000000)
               / 1000000 AS cosine
    FROM cij c JOIN ci ca ON ca.p = c.part_a JOIN ci cb ON cb.p = c.part_b
    WHERE c.n_co / sqrt(CAST(ca.c * cb.c AS DOUBLE)) >= {CF_MIN_COSINE}
    """,
    doc="Item-item collaborative filtering on the co-purchase matrix: "
    "cosine similarity over binary order-item incidence "
    "(n_co / sqrt(c_a * c_b)), min co-support 2.",
)
def item_item_cosine_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recsys primitive next door to copurchase_edges: normalize the
    shared-order count by each item's own order count so boilerplate
    bestsellers don't dominate.  IEEE-exact across engines: integer
    counts, one correctly-rounded sqrt and divide (IEEE 754 requires
    both), floor-quantized output.

    Scale shape: DISTINCT (order, part) first — a part repeated across an
    order's lineitems must not double-count — then the same per-order
    pair expansion as copurchase_edges (Σ k_i² bounded by basket size),
    one keyed agg, and two broadcast-sized joins against the per-item
    counts.  No all-pairs anywhere.
    """
    li = table(spark, sf_dir, "lineitem")
    # consumed by the per-part counts and both wedge sides — pin the
    # (order, part) grain once (no corpus re-distinct per reference)
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ci = op.groupBy("p").agg(F.count("*").alias("c"))
    a, b = op.alias("a"), op.alias("b")
    cij = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b"))
        .agg(F.count("*").alias("n_co"))
        .filter(F.col("n_co") >= CF_MIN_CO)
    )
    ca = ci.select(F.col("p").alias("part_a"), F.col("c").alias("c_a"))
    cb = ci.select(F.col("p").alias("part_b"), F.col("c").alias("c_b"))
    cos = F.col("n_co") / F.sqrt((F.col("c_a") * F.col("c_b")).cast("double"))
    return (
        cij.join(ca, "part_a")
        .join(cb, "part_b")
        .filter(cos >= CF_MIN_COSINE)
        .select(
            "part_a",
            "part_b",
            "n_co",
            (F.floor(cos * 1000000) / 1000000).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# TextRank keyword extraction (round 8)

TEXTRANK_MIN_CO = 2

_WORD_EDGES_SQL = f"""
    SELECT LEAST(words[i], words[i + 1]) AS src,
           GREATEST(words[i], words[i + 1]) AS dst
    FROM (SELECT string_split(text, ' ') AS words FROM documents_canon),
         UNNEST(generate_series(1, len(words) - 1)) AS t(i)
    WHERE words[i] <> words[i + 1]
    GROUP BY 1, 2 HAVING COUNT(*) >= {TEXTRANK_MIN_CO}
"""


@register(
    "textrank_keywords",
    defer=2,
    # Same bit-deterministic decimal PageRank -> HUGEINT recursive-CTE
    # replay as pagerank_copurchase, on the word-adjacency graph instead
    # of the co-purchase graph (TextRank, Mihalcea & Tarau 2004).
    oracle=f"""
    WITH RECURSIVE
    documents_canon AS {SQL_DOCS_CANON},
    -- ^ canonical doc grain (r13 dup-entity leg): duplicate doc_ids
    -- would interleave two copies' tokens in one adjacency window
    e AS ({_WORD_EDGES_SQL}),
    und AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
    deg AS (SELECT src AS id, CAST(COUNT(*) AS HUGEINT) AS deg
            FROM und GROUP BY src),
    pr(iter, id, r15) AS (
      SELECT 0, id, CAST(1000000000000000 AS HUGEINT) FROM deg
      UNION ALL
      SELECT p.iter + 1, u.dst, {_PR_REPLAY}
      FROM pr p
      JOIN und u ON u.src = p.id
      JOIN deg d ON d.id = p.id
      WHERE p.iter < {PAGERANK_ITERS}
      GROUP BY p.iter + 1, u.dst
    )
    SELECT id AS keyword,
           CAST((2 * r15 + 100000) // 200000 AS DOUBLE) / 10000000000.0 AS rank
    FROM pr WHERE iter = {PAGERANK_ITERS}
    ORDER BY rank DESC, keyword LIMIT 20
    """,
    doc="TextRank keyword extraction: PageRank over the word-adjacency "
    f"co-occurrence graph (adjacent word pairs seen >= {TEXTRANK_MIN_CO} "
    "times); top-20 words by rank.",
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-based keyword extraction: a word matters if it co-occurs
    with words that matter — the TextRank formulation, which needs no
    training data or IDF table.  Reuses the decimal-domain ``pagerank``
    (bit-deterministic, hence oracle-replayable) on adjacent-word edges
    with the same min-support bar as the co-purchase graph.

    Scale shape: edge derivation is one lead-window pass over corpus
    token positions + one keyed agg (vocabulary-bounded output), then
    PageRank's 2-shuffle rounds run on the SUPPORTED word graph only.
    """
    from pyspark.sql import Window

    # canonical doc grain (r13 dup-entity leg; oracle mirrors)
    docs = entity_table(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy("pos")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    adj = toks.select(
        "doc_id", "word", F.lead("word").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull() & (F.col("word") != F.col("nxt")))
    edges = (
        adj.groupBy(
            F.least("word", "nxt").alias("src"),
            F.greatest("word", "nxt").alias("dst"),
        )
        .agg(F.count("*").alias("__support"))
        .filter(F.col("__support") >= TEXTRANK_MIN_CO)
        .drop("__support")
    )
    pr = pagerank(edges, "src", "dst")
    return (
        pr.select(
            F.col("id").alias("keyword"),
            F.round(F.col("rank"), 10).cast("double").alias("rank"),
        )
        .orderBy(F.col("rank").desc(), "keyword")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Neighborhood-Jaccard link scoring (round 8)


@register(
    "graph_jaccard_neighbors",
    defer=2,
    oracle=f"""
    WITH e AS ({_EDGES_SQL}),
    und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d
            FROM und GROUP BY 1),
    common AS (
        -- common neighbors of each CONNECTED pair (a < b): wedge join
        -- through the shared endpoint c
        SELECT e.src AS a, e.dst AS b, CAST(COUNT(*) AS BIGINT) AS cn
        FROM e
            JOIN und x ON x.src = e.src
            JOIN und y ON y.src = e.dst AND y.dst = x.dst
        GROUP BY 1, 2
    )
    SELECT e.src AS part_a, e.dst AS part_b,
           COALESCE(c.cn, 0) AS n_common,
           floor(COALESCE(c.cn, 0)
                 / CAST(da.d + db.d - COALESCE(c.cn, 0) AS DOUBLE)
                 * 1000000) / 1000000 AS neighbor_jaccard
    FROM e
        JOIN deg da ON da.id = e.src
        JOIN deg db ON db.id = e.dst
        LEFT JOIN common c ON c.a = e.src AND c.b = e.dst
    """,
    doc="Neighborhood Jaccard for each co-purchase edge: shared neighbors "
    "over union of neighborhoods — the classic link-prediction / "
    "community-strength feature.",
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How embedded is an edge in its local community — an edge whose
    endpoints share most neighbors is intra-cluster; a bridge shares
    none.  Complements item_item_cosine_cf (co-occurrence strength) with
    STRUCTURAL similarity.  Exact integers + one correctly-rounded
    divide, floor-quantized.

    Scale shape: the common-neighbor count is the same wedge join as
    triangle counting (per-edge fanout bounded by degree), never
    all-pairs; degrees join broadcast-sized."""
    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    x = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    y = und.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    common = (
        edges.join(x, edges["src"] == x["a"])
        .join(y, (edges["dst"] == y["b"]) & (x["c"] == y["c"]))
        .groupBy(F.col("src").alias("pa"), F.col("dst").alias("pb"))
        .agg(F.count("*").alias("cn"))
    )
    da = deg.select(F.col("id").alias("src"), F.col("d").alias("d_a"))
    db = deg.select(F.col("id").alias("dst"), F.col("d").alias("d_b"))
    out = (
        edges.join(da, "src")
        .join(db, "dst")
        .join(
            common,
            (F.col("src") == F.col("pa")) & (F.col("dst") == F.col("pb")),
            "left",
        )
        .select(
            F.col("src").alias("part_a"),
            F.col("dst").alias("part_b"),
            F.coalesce("cn", F.lit(0)).alias("n_common"),
            (
                F.floor(
                    F.coalesce("cn", F.lit(0))
                    / (F.col("d_a") + F.col("d_b") - F.coalesce("cn", F.lit(0))).cast(
                        "double"
                    )
                    * 1000000
                )
                / 1000000
            ).alias("neighbor_jaccard"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# k-truss decomposition (round 8)

KTRUSS_K = 3              # every edge must close >= k-2 triangles
KTRUSS_MAX_ROUNDS = 8     # prune-round cap, mirrored exactly by the oracle


@register(
    "graph_ktruss",
    defer=2,
    # The oracle replays the SAME bounded prune loop: each recursion round
    # keeps edges with >= k-2 common neighbors among the CURRENT edge set
    # (triple self-reference of the recursive table: the edge plus its two
    # wedge legs); rounds past the fixpoint are no-ops, so a fixed 8-round
    # replay equals Spark's early-stopping loop.
    oracle=f"""
    WITH RECURSIVE e AS ({{edges_sql}}),
    tr(iter, src, dst) AS (
        SELECT 0, src, dst FROM e
        UNION ALL
        SELECT t.iter + 1, t.src, t.dst
        FROM tr t JOIN tr x ON x.iter = t.iter JOIN tr y ON y.iter = t.iter
        WHERE t.iter < {KTRUSS_MAX_ROUNDS}
          AND (x.src = t.src OR x.dst = t.src)
          AND (y.src = t.dst OR y.dst = t.dst)
          AND (CASE WHEN x.src = t.src THEN x.dst ELSE x.src END)
            = (CASE WHEN y.src = t.dst THEN y.dst ELSE y.src END)
        GROUP BY t.iter + 1, t.src, t.dst
        HAVING COUNT(*) >= {KTRUSS_K - 2}
    ),
    final AS MATERIALIZED (
        SELECT src, dst FROM tr WHERE iter = {KTRUSS_MAX_ROUNDS}
    ),
    undf AS MATERIALIZED (
        SELECT src, dst FROM final UNION SELECT dst, src FROM final
    ),
    sup AS (
        SELECT f.src, f.dst, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM final f
            JOIN undf x ON x.src = f.src
            JOIN undf y ON y.src = f.dst AND y.dst = x.dst
        GROUP BY 1, 2
    )
    SELECT f.src AS part_a, f.dst AS part_b,
           COALESCE(s.cnt, 0) AS support
    FROM final f LEFT JOIN sup s ON s.src = f.src AND s.dst = f.dst
    """.format(edges_sql=_EDGES_SQL),
    doc=f"{KTRUSS_K}-truss of the co-purchase graph: iteratively prune "
    f"edges closing fewer than {KTRUSS_K - 2} triangles until fixpoint "
    f"(round cap {KTRUSS_MAX_ROUNDS}); surviving edges with final "
    "support.",
)
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cohesion core the triangle COUNT can't give: k-truss keeps only
    edges embedded in enough triangles, and pruning cascades (removing a
    weak edge can orphan its neighbors), hence the loop.  Denser and
    cheaper than k-core for community cores (Cohen 2008).

    Scale shape: each round is ONE wedge join (fanout bounded by degree,
    never all-pairs) + one keyed agg over the CURRENT edge set, which
    only shrinks; rounds are lineage-truncated via eager localCheckpoint
    with the same RDD-id release discipline as label_propagation.
    """

    def support(edges: DataFrame) -> DataFrame:
        und = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        x = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        y = und.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        return (
            edges.join(x, edges["src"] == x["a"])
            .join(y, (edges["dst"] == y["b"]) & (x["c"] == y["c"]))
            .groupBy(F.col("src").alias("sa"), F.col("dst").alias("sb"))
            .agg(F.count("*").alias("cnt"))
        )

    jsc = spark.sparkContext._jsc

    def _pids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _release(ids: set[int]) -> None:
        jmap = jsc.getPersistentRDDs()
        for rid in jmap.keySet().toArray():
            if int(rid) in ids:
                jmap.get(rid).unpersist(True)

    snap = _pids()
    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    edge_ids = _pids() - snap
    n = edges.count()
    for _ in range(KTRUSS_MAX_ROUNDS):
        kept = (
            edges.join(
                support(edges).filter(F.col("cnt") >= KTRUSS_K - 2),
                (F.col("src") == F.col("sa")) & (F.col("dst") == F.col("sb")),
                "left_semi",
            )
        )
        snap = _pids()
        kept = kept.localCheckpoint(eager=True)
        new_ids = _pids() - snap
        m = kept.count()
        _release(edge_ids)
        edge_ids = new_ids
        edges, prev_n, n = kept, n, m
        if m == prev_n:
            break
    out = (
        edges.join(
            support(edges),
            (F.col("src") == F.col("sa")) & (F.col("dst") == F.col("sb")),
            "left",
        )
        .select(
            F.col("src").alias("part_a"),
            F.col("dst").alias("part_b"),
            F.coalesce("cnt", F.lit(0)).alias("support"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# HITS hubs & authorities on the customer->part bipartite graph (round 8)

HITS_HALF_STEPS = 16   # 8 full hub/authority alternations
HITS_TOP_K = 20


@register(
    "graph_hits_bipartite",
    defer=2,
    # Exact integer replay: no per-round normalization (values stay exact
    # integers; growth is degree-bounded — max ~3.5e25 at 16 half-steps on
    # these corpora, far under int128/decimal(38,0)); ONE integral
    # normalization to parts-per-million at the end.  The recursive term
    # is a UNION ALL of the two half-step updates, each referencing the
    # recursive table once.
    oracle=f"""
    WITH RECURSIVE e AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    rec(step, kind, id, v) AS (
        SELECT 0, 'hub', c, CAST(1 AS HUGEINT) FROM (SELECT DISTINCT c FROM e)
        UNION ALL
        (
          SELECT r.step + 1, 'authority', e.p, CAST(SUM(r.v) AS HUGEINT)
          FROM rec r JOIN e ON e.c = r.id
          WHERE r.kind = 'hub' AND r.step < {HITS_HALF_STEPS}
          GROUP BY 1, 2, 3
          UNION ALL
          SELECT r.step + 1, 'hub', e.c, CAST(SUM(r.v) AS HUGEINT)
          FROM rec r JOIN e ON e.p = r.id
          WHERE r.kind = 'authority' AND r.step < {HITS_HALF_STEPS}
          GROUP BY 1, 2, 3
        )
    ),
    finals AS (
        SELECT kind, id, v FROM rec
        WHERE step IN ({HITS_HALF_STEPS - 1}, {HITS_HALF_STEPS})
    ),
    normed AS (
        SELECT kind, id,
               CAST((v * 1000000) // MAX(v) OVER (PARTITION BY kind)
                    AS BIGINT) AS score_ppm,
               row_number() OVER (PARTITION BY kind
                                  ORDER BY v DESC, id) AS rn
        FROM finals
    )
    SELECT kind, id, score_ppm FROM normed WHERE rn <= {HITS_TOP_K}
    """,
    doc=f"HITS on the customer->part purchase graph ({HITS_HALF_STEPS // 2} "
    "exact-integer alternations, no intermediate normalization): top-"
    f"{HITS_TOP_K} hub customers and authority parts, scores in ppm of "
    "the side maximum.",
)
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg's hubs-and-authorities on the purchase bipartite graph:
    an authoritative part is bought by broad-basket customers, and a hub
    customer buys authoritative parts — mutually recursive, which degree
    counts alone can't express.  All iteration stays in EXACT integer
    arithmetic (decimal(38,0) on the Spark side, HUGEINT in the oracle):
    growth per half-step is bounded by the side's max degree, so 16
    half-steps stay ~1e25 << 1e38, and one integral parts-per-million
    division at the end makes the output engine-exact with no float in
    the entire path.

    Scale shape: each half-step is one keyed equi-join + one keyed agg
    over the distinct (customer, part) edge set; lineage truncated by
    eager localCheckpoint every few steps with RDD-id release.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    jsc = spark.sparkContext._jsc

    def _pids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _release(ids: set[int]) -> None:
        jmap = jsc.getPersistentRDDs()
        for rid in jmap.keySet().toArray():
            if int(rid) in ids:
                jmap.get(rid).unpersist(True)

    snap = _pids()
    e = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e_ids = _pids() - snap
    cur = e.select(F.col("c").alias("id")).distinct().withColumn(
        "v", F.lit(1).cast("decimal(38,0)")
    )
    prev_ids: set[int] = set()
    kind = "hub"
    for step in range(1, HITS_HALF_STEPS + 1):
        if kind == "hub":  # hubs feed authorities
            nxt = (
                e.join(cur, e["c"] == cur["id"])
                .groupBy(F.col("p").alias("id"))
                .agg(F.sum("v").alias("v"))
            )
            kind = "authority"
        else:
            nxt = (
                e.join(cur, e["p"] == cur["id"])
                .groupBy(F.col("c").alias("id"))
                .agg(F.sum("v").alias("v"))
            )
            kind = "hub"
        snap = _pids()
        nxt = nxt.localCheckpoint(eager=True)
        new_ids = _pids() - snap
        if step < HITS_HALF_STEPS:
            # the state BEFORE the one just consumed is now dead; the
            # last two states (final authorities + final hubs) survive
            # because they back the returned frame
            _release(prev_ids)
            prev_ids = new_ids
        cur = nxt
        if step == HITS_HALF_STEPS - 1:
            auth_final = nxt  # the last authority vector
    hubs_final = cur
    finals = auth_final.withColumn("kind", F.lit("authority")).unionByName(
        hubs_final.withColumn("kind", F.lit("hub"))
    )
    from pyspark.sql import Window as W

    wk = W.partitionBy("kind")
    normed = (
        finals.withColumn("vmax", F.max("v").over(wk))
        .select(
            "kind",
            "id",
            F.expr("CAST((v * 1000000) div vmax AS BIGINT)").alias("score_ppm"),
            F.row_number().over(wk.orderBy(F.col("v").desc(), "id")).alias("rn"),
        )
    )
    out = normed.filter(F.col("rn") <= HITS_TOP_K).select("kind", "id", "score_ppm")
    _release(e_ids)  # finals are checkpointed; the edge blocks are dead
    return out


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (round 9)

#: Bellman-Ford rounds: distances are exact over all paths of <= this many
#: edges.  Matches BFS_MAX_DEPTH so the two traversals are comparable.
SSSP_ROUNDS = 6

_WEDGES_SQL = f"""
    SELECT a.l_partkey AS src, b.l_partkey AS dst,
           1000000 // COUNT(*) AS w
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= {EDGE_MIN_SUPPORT}
"""


@register(
    "graph_sssp_weighted",
    defer=3,
    oracle=f"""
    WITH RECURSIVE e AS MATERIALIZED ({_WEDGES_SQL}),
    und AS MATERIALIZED (
        SELECT src, dst, w FROM e
        UNION ALL SELECT dst AS src, src AS dst, w FROM e
    ),
    start AS (
        SELECT src AS s FROM und GROUP BY src
        ORDER BY COUNT(*) DESC, src LIMIT 1
    ),
    -- UNION-distinct recursion over (id, dist, round) states: after round
    -- r the minimum dist per id equals the shortest path using <= r edges
    -- (Bellman-Ford invariant); positive weights keep states finite
    reach(id, d, r) AS (
      SELECT s, CAST(0 AS BIGINT), 0 FROM start
      UNION
      SELECT u.dst, x.d + u.w, x.r + 1
      FROM reach x JOIN und u ON u.src = x.id
      WHERE x.r < {SSSP_ROUNDS}
    )
    SELECT id, CAST(MIN(d) AS BIGINT) AS dist_ppm
    FROM reach GROUP BY id
    """,
    doc=f"Weighted SSSP (Bellman-Ford, {SSSP_ROUNDS} rounds) from the "
    "max-degree hub of the co-purchase graph (tie-break: smallest id); "
    "edge length = 1e6 div co-purchase support, so strongly associated "
    "parts are close.  Exact over paths of <= 6 edges; integer distances.",
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distances with edge COSTS — the primitive BFS (hop counts) cannot
    express; relatedness distance over the co-purchase graph is the
    'how far is part X from part Y, discounting weak links' question.
    Synchronous Bellman-Ford: each round joins the current distance
    vector to the edge list and takes the keyed min of (old, relaxed) —
    two keyed shuffles per round on frames bounded by the reachable set,
    never more.  Rounds compose lazily into 2^r re-evaluations if left
    unchecked, so each round's vector is an eager ``localCheckpoint``
    whose predecessor is released by RDD id (the BFS/HITS discipline,
    graph.py:1044).  Integer ppm weights (1e6 div support) make every
    distance an exact BIGINT, which is what lets a recursive-CTE oracle
    replay all {SSSP_ROUNDS} rounds bit-exactly.
    """
    jsc = spark.sparkContext._jsc

    def _pids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    def _release(ids: set[int]) -> None:
        jmap = jsc.getPersistentRDDs()
        for rid in jmap.keySet().toArray():
            if int(rid) in ids:
                jmap.get(rid).unpersist(True)

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    snap = _pids()
    wedges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= EDGE_MIN_SUPPORT)
        .select("src", "dst", F.expr("1000000 div support").alias("w"))
    )
    und = (
        wedges.unionByName(
            wedges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .localCheckpoint(eager=True)
    )
    und_ids = _pids() - snap
    dist = (
        und.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .orderBy(F.col("deg").desc(), "src")
        .limit(1)
        .select(F.col("src").alias("id"), F.lit(0).cast("long").alias("d"))
    )
    snap = _pids()
    dist = dist.localCheckpoint(eager=True)
    prev_ids = _pids() - snap
    for rnd in range(1, SSSP_ROUNDS + 1):
        relaxed = (
            und.join(dist.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("d") + F.col("w")).alias("d"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("d").alias("d"))
        )
        # dist is referenced twice per round (join + union): pin every
        # SECOND round — lineage depth stays <= 2 (a bounded 4x subtree),
        # at half the eager-checkpoint jobs of pin-every-round.
        if rnd % 2 == 0 or rnd == SSSP_ROUNDS:
            snap = _pids()
            dist = dist.localCheckpoint(eager=True)
            new_ids = _pids() - snap
            _release(prev_ids)
            prev_ids = new_ids
    _release(und_ids)  # dist is checkpointed; the edge blocks are dead
    return dist.select("id", F.col("d").alias("dist_ppm"))
