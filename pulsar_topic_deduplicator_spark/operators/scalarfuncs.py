"""Scalar-function families — string / date / math / JSON / percentile.

The reference's scalar surface is tiny (JSON parse/serialize, hex encode,
map filter/merge — SURVEY.md §2.3); an analytics engine needs the standard
library. One query per family, every expression chosen to be bit-identical
across engines (integer/date arithmetic, exact DP algorithms like
Levenshtein, p=0.5 percentiles whose interpolation factor is exactly 0 or
0.5 in binary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the events props column: typed extraction
    (get_json_object / from_json cast) — the op #12 parse generalized to
    arbitrary JSON paths."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.from_json("props", "map<string,int>")["k"].alias("k_typed"),
        F.length("props").alias("raw_len"),
    )


def string_funcs_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family over customer names: case, slicing, padding, search,
    edit distance (exact DP — identical on any engine)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("padded_key"),
        F.instr(F.col("c_name"), "Customer").alias("pos_customer"),
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000001")).alias(
            "edit_dist"
        ),
        F.reverse(F.col("c_name")).alias("reversed"),
        F.translate(F.col("c_name"), "#0", "_x").alias("translated"),
    )


def date_funcs_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family over order dates: parts extraction, truncation,
    offset arithmetic, and day differencing (all integer-exact; day-of-week
    conventions differ across engines and are deliberately avoided)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(
            F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_1999"),
    )


def median_quantity_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p=0.5 percentile per group: the interpolation factor is exactly
    0 or 0.5 (binary-exact), so linear interpolation agrees bit-for-bit
    across engines — the one percentile that is safely oracle-checkable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


def math_funcs_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family over lineitem measures — restricted to IEEE-exact
    operations (abs/sqrt/floor/ceil/round/pmod are correctly-rounded or
    integer-exact everywhere; log/exp/trig differ across libm builds and
    are deliberately excluded from the oracle surface)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_dev"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.floor("l_extendedprice").cast("bigint").alias("floor_price"),
        F.ceil("l_extendedprice").cast("bigint").alias("ceil_price"),
        # round() only off .5 boundaries: Spark rounds HALF_UP, DuckDB
        # half-to-even (observed: 17.365 → 17.37 vs 17.36). discount×100 is
        # integer-valued ±1 ulp, so its rounding never sits on a boundary.
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("disc_pct"),
        F.pmod(F.col("l_orderkey"), F.lit(97)).alias("bucket97"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
    )


def array_funcs_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized document text: size, distinct, indexing,
    membership, slice+join, and sorted-order (binary collation on both
    engines). `array_position` returns 0-when-absent on Spark; the oracle
    coalesces DuckDB's NULL-when-absent to match."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_uniq"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_contains(words, "the").alias("has_the"),
        F.array_position(words, "spark").alias("pos_spark"),
        F.array_join(F.slice(words, 1, 3), "_").alias("head3"),
        F.array_join(
            F.slice(F.sort_array(F.array_distinct(words)), 1, 3), "_"
        ).alias("sorted3"),
    )


def map_funcs_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family over the events props (parsed from JSON): cardinality,
    sorted key list, typed value lookup, and the reference's ignore-key
    projection expressed as `map_filter` (op #4, SURVEY.md §2.2) — the
    oracle mirrors each via DuckDB's JSON functions."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.size(m).alias("n_props"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "k").cast("int").alias("k_val"),
        F.size(F.map_filter(m, lambda k, v: k != "k")).alias("n_after_ignore"),
    )


def bit_funcs_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family over integer keys: xor/and, shifts, popcount — all
    integer-exact on any engine."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("xor_keys"),
        (F.col("l_orderkey").bitwiseAND(F.lit(255))).alias("low_byte"),
        F.shiftleft(F.col("l_linenumber").cast("int"), 3).alias("shl3"),
        F.shiftright(F.col("l_partkey").cast("int"), 2).alias("shr2"),
        F.bit_count("l_suppkey").alias("popcount_supp"),
    )


def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per event type (Greenwald-Khanna sketch) —
    rows-only: sketch internals differ across engines by design; the exact
    p50 twin is median_quantity_per_flag.

    Output is LONG FORM — one (event_type, quantile) row per sketch cell —
    so every column is a sortable scalar at the harness boundary (the
    label_centroids discipline; a double[] column is not canonicalizable)."""
    ev = load_table(spark, sf_dir, "events")
    qs = [0.5, 0.95]
    agg = ev.groupBy("event_type").agg(
        F.approx_percentile(
            "value", F.array(*[F.lit(q) for q in qs]), 10000
        ).alias("ps"),
        F.count(F.lit(1)).alias("n"),
    )
    pos = F.posexplode("ps")
    return agg.select("event_type", "n", pos.alias("q_idx", "q_value")).select(
        "event_type",
        F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("q_idx") + 1).alias(
            "quantile"
        ),
        "q_value",
        "n",
    )


def approx_quantiles_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable CONTRACT of the GK-sketch percentiles (the
    ann_recall_contracts pattern): the sketch VALUES are engine-specific by
    design (``approx_quantiles_value`` stays rows-only), but the property
    that makes a sketch correct — every returned value's exact rank lies
    inside the Greenwald-Khanna bracket ``[(q-ε)·n, (q+ε)·n]`` with
    ε = 1/accuracy — is a verdict the oracle pins per (event_type, quantile)
    row, so a broken sketch turns a CORRECTNESS row red.

    The bracket check is exact and distributed: one fan-out join of the
    events against the per-type sketch rows (2 quantiles → 2× one column),
    then a count aggregation — no driver-side values beyond the verdict."""
    ev = load_table(spark, sf_dir, "events")
    qs = [0.5, 0.95]
    accuracy = 10000
    q_arr = F.array(*[F.lit(q) for q in qs])
    agg = ev.groupBy("event_type").agg(
        F.approx_percentile("value", q_arr, accuracy).alias("ps"),
        F.count("value").alias("n"),  # percentile ignores NULLs; count must too
    )
    pos = F.posexplode("ps")
    sk = agg.select("event_type", "n", pos.alias("q_idx", "q_value")).select(
        "event_type",
        F.element_at(q_arr, F.col("q_idx") + 1).alias("quantile"),
        "q_value",
        "n",
    )
    ranks = (
        ev.select("event_type", "value")
        .join(sk, "event_type")
        .groupBy("event_type", "quantile", "n")
        .agg(
            F.count(F.when(F.col("value") < F.col("q_value"), 1)).alias("n_lt"),
            F.count(F.when(F.col("value") <= F.col("q_value"), 1)).alias("n_le"),
        )
    )
    eps = 1.0 / accuracy
    # the returned value's rank interval is (n_lt, n_le]; it must intersect
    # the GK bracket (±1 row of slack for the rank-vs-count boundary)
    within = (
        F.col("n_lt") <= (F.col("quantile") + eps) * F.col("n") + 1
    ) & (F.col("n_le") >= (F.col("quantile") - eps) * F.col("n") - 1)
    return ranks.select(
        "event_type", "quantile", within.alias("within_bracket")
    )


ORACLES: dict[str, str] = {
    "approx_quantiles_contracts": """
        SELECT event_type, CAST(q AS DOUBLE) AS quantile,
               TRUE AS within_bracket
        FROM (SELECT DISTINCT event_type FROM events)
        CROSS JOIN (SELECT 0.5 AS q UNION ALL SELECT 0.95) quantiles
    """,
    "bit_funcs_demo": """
        SELECT l_orderkey, l_linenumber,
               xor(l_orderkey, l_partkey) AS xor_keys,
               l_orderkey & 255 AS low_byte,
               CAST(l_linenumber AS INTEGER) << 3 AS shl3,
               CAST(l_partkey AS INTEGER) >> 2 AS shr2,
               CAST(bit_count(l_suppkey) AS INTEGER) AS popcount_supp
        FROM lineitem
    """,
    "array_funcs_demo": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               len(list_distinct(string_split(text, ' '))) AS n_uniq,
               string_split(text, ' ')[1] AS first_word,
               string_split(text, ' ')[-1] AS last_word,
               list_contains(string_split(text, ' '), 'the') AS has_the,
               CAST(coalesce(list_position(string_split(text, ' '), 'spark'), 0)
                    AS BIGINT) AS pos_spark,
               array_to_string(list_slice(string_split(text, ' '), 1, 3), '_')
                 AS head3,
               array_to_string(
                 list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3),
                 '_') AS sorted3
        FROM documents
    """,
    "map_funcs_demo": """
        SELECT event_id,
               CAST(len(json_keys(props)) AS INTEGER) AS n_props,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
               CAST(len(list_filter(json_keys(props), x -> x != 'k'))
                    AS INTEGER) AS n_after_ignore,
        FROM events
    """,
    "math_funcs_demo": """
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05) AS abs_dev,
               sqrt(l_quantity) AS sqrt_qty,
               CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
               CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
               CAST(round(l_discount * 100, 0) AS BIGINT) AS disc_pct,
               l_orderkey % 97 AS bucket97,
               greatest(l_tax, l_discount) AS max_rate
        FROM lineitem
    """,
    "json_extract_props": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
               length(props) AS raw_len
        FROM events
    """,
    "string_funcs_demo": """
        SELECT c_custkey,
               upper(c_name) AS upper_name,
               substring(c_name, 1, 8) AS prefix8,
               length(c_name) AS name_len,
               lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded_key,
               instr(c_name, 'Customer') AS pos_customer,
               levenshtein(c_name, 'Customer#000000001') AS edit_dist,
               reverse(c_name) AS reversed,
               translate(c_name, '#0', '_x') AS translated
        FROM customer
    """,
    "date_funcs_demo": """
        SELECT o_orderkey,
               year(o_orderdate) AS yr,
               month(o_orderdate) AS mo,
               day(o_orderdate) AS dom,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
               datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
                 AS days_to_1999
        FROM orders
    """,
    "median_quantity_per_flag": """
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS median_qty,
               min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
}
