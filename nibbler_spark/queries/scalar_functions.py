"""Scalar function queries (SURVEY §2.3 H1–H17; H18 vector math lives in
llm_vectors). One declared query per function family; oracle-side dialect
rewrites follow FIXTURES.md §4.5 (dayofweek +1, date_diff arg order,
strftime token pairs, pmod expansion, posexplode index −1, list_sort
wrappers)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nibbler_spark.queries._helpers import seq1

from nibbler_spark.queries import register
from nibbler_spark.sources import load_table, register_temp_views


@register(
    "h01_string_basic",
    survey_id="H1",
    category="scalar",
    oracle="""
SELECT p_partkey,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       CONCAT_WS('|', p_name, p_brand) AS joined,
       UPPER(p_name) AS up,
       LOWER(p_type) AS lo,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_name, 2, 3) AS sub,
       TRIM('  x  ') AS trimmed,
       LTRIM('  x') AS ltrimmed,
       RTRIM('x  ') AS rtrimmed,
       LPAD(p_brand, 12, '*') AS lpadded,
       RPAD(p_brand, 12, '*') AS rpadded,
       REPLACE(p_name, ' ', '_') AS replaced,
       REVERSE(p_brand) AS rev,
       REPEAT(p_brand, 2) AS doubled,
       STRPOS(p_name, 'widget') AS widget_pos,
       p_name LIKE 'cold%' AS startswith_cold,
       p_name LIKE '%bolt' AS endswith_bolt,
       CONTAINS(p_name, 'small') AS has_small,
       STRING_SPLIT(p_name, ' ') AS name_tokens
FROM part ORDER BY p_partkey
""",
)
def h01_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basic string functions (split keeps token order — deterministic)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias(
            "brand_type"
        ),
        F.concat_ws("|", "p_name", "p_brand").alias("joined"),
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 2, 3).alias("sub"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.ltrim(F.lit("  x")).alias("ltrimmed"),
        F.rtrim(F.lit("x  ")).alias("rtrimmed"),
        F.lpad("p_brand", 12, "*").alias("lpadded"),
        F.rpad("p_brand", 12, "*").alias("rpadded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("replaced"),
        F.reverse("p_brand").alias("rev"),
        F.repeat("p_brand", 2).alias("doubled"),
        F.instr("p_name", "widget").alias("widget_pos"),
        F.startswith("p_name", F.lit("cold")).alias("startswith_cold"),
        F.endswith("p_name", F.lit("bolt")).alias("endswith_bolt"),
        F.contains("p_name", F.lit("small")).alias("has_small"),
        F.split("p_name", " ").alias("name_tokens"),
    ).orderBy("p_partkey")


@register(
    "h02_string_regex",
    survey_id="H2",
    category="scalar",
    oracle="""
SELECT event_id,
       REGEXP_EXTRACT(props, '"k": ([0-9]+)', 1) AS k_digits,
       REGEXP_REPLACE(props, '[0-9]+', '#') AS masked,
       REGEXP_MATCHES(event_type, '^(click|view)$') AS is_clickview
FROM events ORDER BY event_id
""",
)
def h02_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract/replace/match — patterns restricted to the Java∩RE2
    common subset (SURVEY H2 ⚠: no lookbehind)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_extract("props", '"k": ([0-9]+)', 1).alias("k_digits"),
        F.regexp_replace("props", "[0-9]+", "#").alias("masked"),
        F.col("event_type").rlike("^(click|view)$").alias("is_clickview"),
    ).orderBy("event_id")


@register(
    "h03_levenshtein",
    survey_id="H3",
    category="scalar",
    oracle="""
SELECT p_partkey, LEVENSHTEIN(p_name, p_type) AS name_type_dist
FROM part ORDER BY p_partkey
""",
)
def h03_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").alias("name_type_dist"),
    ).orderBy("p_partkey")


@register(
    "h04_hashing",
    survey_id="H4",
    category="scalar",
    oracle="""
SELECT doc_id, MD5(text) AS text_md5, SHA256(text) AS text_sha256
FROM documents ORDER BY doc_id
""",
)
def h04_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / sha2-256 — lowercase hex in both engines."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    ).orderBy("doc_id")


@register(
    "h05_date_extract",
    survey_id="H5",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS mo, DAY(o_orderdate) AS d,
       HOUR(o_orderdate) AS h, MINUTE(o_orderdate) AS mi, SECOND(o_orderdate) AS s,
       DAYOFWEEK(o_orderdate) + 1 AS dow,
       DAYOFYEAR(o_orderdate) AS doy,
       WEEKOFYEAR(o_orderdate) AS woy
FROM orders ORDER BY o_orderkey
""",
)
def h05_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction. Spark dayofweek is 1=Sunday..7=Saturday vs
    DuckDB 0=Sunday..6 — oracle adds 1 (SURVEY H5 ⚠); weekofyear is ISO in
    both."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("mo"),
        F.day("o_orderdate").alias("d"),
        F.hour("o_orderdate").alias("h"),
        F.minute("o_orderdate").alias("mi"),
        F.second("o_orderdate").alias("s"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("woy"),
    ).orderBy("o_orderkey")


@register(
    "h06_date_arith",
    survey_id="H6",
    category="scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(DATE_TRUNC('day', l_shipdate) AS TIMESTAMP) AS ship_day,
       CAST(DATE_TRUNC('month', l_shipdate) AS TIMESTAMP) AS ship_month,
       CAST(DATE_TRUNC('week', l_shipdate) AS TIMESTAMP) AS ship_week,
       CAST(l_shipdate AS DATE) + 5 AS plus5,
       CAST(l_shipdate AS DATE) - 5 AS minus5,
       DATE_DIFF('day', CAST(l_shipdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       CAST(CAST(l_shipdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3mo,
       LAST_DAY(CAST(l_shipdate AS DATE)) AS month_end,
       MAKE_DATE(2024, 2, 29) AS leap_day
FROM lineitem ORDER BY l_orderkey, l_linenumber
""",
)
def h06_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic. DuckDB's date_diff takes (unit, start, end) —
    argument order flipped vs Spark's datediff(end, start) (SURVEY H6 ⚠);
    add_months clamps month-ends in both."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_trunc("day", "l_shipdate").alias("ship_day"),
        F.date_trunc("month", "l_shipdate").alias("ship_month"),
        F.date_trunc("week", "l_shipdate").alias("ship_week"),
        F.date_add(d, 5).alias("plus5"),
        F.date_sub(d, 5).alias("minus5"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
        F.add_months(d, 3).alias("plus3mo"),
        F.last_day(d).alias("month_end"),
        F.make_date(F.lit(2024), F.lit(2), F.lit(29)).alias("leap_day"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "h07_epoch_conversion",
    survey_id="H7",
    category="scalar",
    oracle="""
SELECT event_id,
       CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS unix_s,
       STRFTIME(TO_TIMESTAMP(CAST(FLOOR(EPOCH(ts)) AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS from_unix,
       CAST(ts AS DATE) AS d,
       STRPTIME('2024-03-05 10:30:00', '%Y-%m-%d %H:%M:%S') AS parsed_ts
FROM events ORDER BY event_id
""",
)
def h07_epoch_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unix_timestamp / from_unixtime / to_date / to_timestamp with the
    session timezone pinned UTC on both sides."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_timestamp("ts").alias("unix_s"),
        F.from_unixtime(F.unix_timestamp("ts")).alias("from_unix"),
        F.to_date("ts").alias("d"),
        F.to_timestamp(
            F.lit("2024-03-05 10:30:00"), "yyyy-MM-dd HH:mm:ss"
        ).alias("parsed_ts"),
    ).orderBy("event_id")


@register(
    "h08_date_format",
    survey_id="H8",
    category="scalar",
    oracle="""
SELECT event_id,
       STRFTIME(ts, '%Y-%m-%d %H:%M') AS fmt_minute,
       STRFTIME(ts, '%d/%m/%Y') AS fmt_dmy
FROM events ORDER BY event_id
""",
)
def h08_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_format — Java pattern ↔ strftime pairs: yyyy-MM-dd HH:mm ↔
    %Y-%m-%d %H:%M and dd/MM/yyyy ↔ %d/%m/%Y (SURVEY H8 ⚠)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("fmt_minute"),
        F.date_format("ts", "dd/MM/yyyy").alias("fmt_dmy"),
    ).orderBy("event_id")


@register(
    "h09_math",
    survey_id="H9",
    category="scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_quantity - 25) AS absdev,
       CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
       CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       ROUND(l_extendedprice / 7, 2) AS rounded,
       ROUND(POWER(l_quantity, 2), 4) AS qty_sq,
       ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
       ROUND(EXP(l_discount), 4) AS disc_exp,
       ROUND(LN(l_extendedprice), 4) AS price_ln,
       ROUND(LOG10(l_extendedprice), 4) AS price_log10,
       CAST(SIGN(l_quantity - 25) AS INTEGER) AS dev_sign,
       GREATEST(l_quantity, l_discount * 100) AS biggest,
       LEAST(l_quantity, l_discount * 100) AS smallest,
       l_orderkey % 7 AS mod7,
       ((CAST(l_quantity AS BIGINT) - 25) % 7 + 7) % 7 AS pmod7
FROM lineitem ORDER BY l_orderkey, l_linenumber
""",
)
def h09_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions. pmod expands to ((a%b)+b)%b in the oracle (H9 ⚠);
    floor/ceil cast to BIGINT on both sides; transcendentals rounded to
    4 dp (libm vs java.lang.Math may differ in the last ulp).

    r11 perf (guide §2.3): the 16-expression projection sits ABOVE the
    output sort — below it, the computed columns ride the range
    exchange AND the range partitioner's sampling job evaluates the
    whole projection a second time; above it, only the 5 raw columns
    shuffle and the transcendentals run once, in the wide post-exchange
    stage (3.7 s → 1.0 s noop, identical rows/order)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    ).orderBy("l_orderkey", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("absdev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        # /7 keeps results off exact .xx5 midpoints, where the two engines'
        # double-rounding methods legitimately disagree (SURVEY H9 ⚠).
        F.round(F.col("l_extendedprice") / 7, 2).alias("rounded"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.exp("l_discount"), 4).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 4).alias("price_log10"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("dev_sign"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias(
            "biggest"
        ),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias(
            "smallest"
        ),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.pmod(F.col("l_quantity").cast("bigint") - 25, F.lit(7)).alias(
            "pmod7"
        ),
    )


@register(
    "h10_null_ops",
    survey_id="H10",
    category="scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       COALESCE(NULLIF(l_discount, 0), -1) AS disc_or_neg1,
       NULLIF(l_returnflag, 'N') AS flag_or_null,
       IFNULL(NULLIF(l_returnflag, 'N'), 'none') AS flag_nvl,
       NULLIF(l_discount, 0) IS NULL AS no_discount,
       NULLIF(l_discount, 0) IS NOT NULL AS has_discount
FROM lineitem ORDER BY l_orderkey, l_linenumber
""",
)
def h10_null_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / nvl / isnull / isnotnull."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    flag_null = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(disc_null, F.lit(-1.0)).alias("disc_or_neg1"),
        flag_null.alias("flag_or_null"),
        F.nvl(flag_null, F.lit("none")).alias("flag_nvl"),
        F.isnull(disc_null).alias("no_discount"),
        F.isnotnull(disc_null).alias("has_discount"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "h11_array_ops",
    survey_id="H11",
    category="scalar",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_toks,
       toks[1] AS first_tok,
       toks[len(toks)] AS last_tok,
       list_contains(toks, 'spark') AS has_spark,
       COALESCE(list_position(toks, 'spark'), 0) AS spark_pos,
       list_sort(list_distinct(toks)) AS uniq_sorted,
       list_aggregate(toks, 'max') AS max_tok,
       list_aggregate(toks, 'min') AS min_tok,
       toks[2:4] AS middle,
       flatten([toks[1:2], toks[2:3]]) AS flat2,
       list_concat(toks[1:1], ['zzz']) AS plus_tail,
       array_to_string(toks[1:3], '-') AS joined3,
       generate_series(1, 5) AS seq5
FROM t ORDER BY doc_id
""",
)
def h11_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over tokenized text. 1-based indexing in both
    engines; array_position missing ⇒ Spark 0 vs DuckDB NULL (oracle
    COALESCEs); Spark slice(arr, start, length) vs DuckDB arr[a:b]
    (inclusive end); sequence ⇒ generate_series (SURVEY H11 ⚠)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.element_at("toks", 1).alias("first_tok"),
        F.element_at("toks", F.size("toks")).alias("last_tok"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.array_position("toks", "spark").alias("spark_pos"),
        F.sort_array(F.array_distinct("toks")).alias("uniq_sorted"),
        F.array_max("toks").alias("max_tok"),
        F.array_min("toks").alias("min_tok"),
        F.slice("toks", 2, 3).alias("middle"),
        F.flatten(
            F.array(F.slice("toks", 1, 2), F.slice("toks", 2, 2))
        ).alias("flat2"),
        F.concat(F.slice("toks", 1, 1), F.array(F.lit("zzz"))).alias(
            "plus_tail"
        ),
        F.array_join(F.slice("toks", 1, 3), "-").alias("joined3"),
        F.sequence(F.lit(1), F.lit(5)).alias("seq5"),
    ).orderBy("doc_id")


@register(
    "h12_array_lambdas",
    survey_id="H12",
    category="scalar",
    oracle="""
WITH t AS (SELECT l_orderkey, l_linenumber,
                  [CAST(l_quantity AS BIGINT), CAST(l_linenumber AS BIGINT),
                   l_orderkey % 10] AS nums
           FROM lineitem)
SELECT l_orderkey, l_linenumber,
       list_transform(nums, x -> x * 2) AS doubled,
       list_filter(nums, x -> x % 2 = 0) AS evens,
       len(list_filter(nums, x -> x > 5)) > 0 AS any_gt5,
       len(list_filter(nums, x -> NOT (x >= 0))) = 0 AS all_nonneg,
       100 + list_sum(nums) AS agg_sum,
       list_transform(generate_series(1, len(nums)),
                      i -> nums[i] + 10 * i) AS zipped
FROM t ORDER BY l_orderkey, l_linenumber
""",
)
def h12_array_lambdas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform/filter/exists/forall/
    aggregate/zip_with. DuckDB 1.0 lacks exists/forall/reduce/zip_with —
    oracle rewrites via list_filter length checks, list_sum, and an
    index-transform (SURVEY H12 ⚠). Integer elements keep sums exact.

    r11 perf (guide §2.3, h09 pattern): the six interpreted HOFs are
    projected ABOVE the output sort, so only the 3-element nums array
    rides the range exchange and the non-codegen lambdas run once in
    the wide post-exchange stage instead of twice (sampling pass +
    real pass) in the scan task. Identical rows and order."""
    li = load_table(spark, sf_dir, "lineitem")
    nums = F.array(
        F.col("l_quantity").cast("bigint"),
        F.col("l_linenumber").cast("bigint"),
        F.col("l_orderkey") % 10,
    )
    t = li.select("l_orderkey", "l_linenumber", nums.alias("nums")).orderBy(
        "l_orderkey", "l_linenumber"
    )
    idx = seq1(F.size("nums"))
    return t.select(
        "l_orderkey",
        "l_linenumber",
        F.transform("nums", lambda x: x * 2).alias("doubled"),
        F.filter("nums", lambda x: x % 2 == 0).alias("evens"),
        F.exists("nums", lambda x: x > 5).alias("any_gt5"),
        F.forall("nums", lambda x: x >= 0).alias("all_nonneg"),
        F.aggregate(
            "nums", F.lit(100).cast("bigint"), lambda acc, x: acc + x
        ).alias("agg_sum"),
        F.zip_with(
            idx,
            F.col("nums"),
            lambda i, x: x + 10 * i,
        ).alias("zipped"),
    )


@register(
    "h13_explode_family",
    survey_id="H13",
    category="scalar",
    oracle="""
WITH t AS (
  SELECT doc_id,
         CASE WHEN n_chars < 150 THEN NULL
              ELSE string_split(text, ' ') END AS toks
  FROM documents
),
exploded AS (
  SELECT doc_id,
         UNNEST(list_transform(
           generate_series(1, len(COALESCE(toks, [NULL]))),
           i -> struct_pack(pos := CASE WHEN toks IS NULL THEN NULL ELSE i - 1 END,
                            tok := toks[i]))) AS u
  FROM t
)
SELECT doc_id, u.pos AS pos, u.tok AS tok
FROM exploded
ORDER BY doc_id, pos NULLS FIRST, tok NULLS FIRST
""",
)
def h13_explode_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer over tokens (NULL array for short docs). Spark's
    posexplode is 0-based; DuckDB's rewrite subtracts 1 and emulates
    OUTER by unnesting [NULL] for NULL arrays (SURVEY H13 ⚠)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.when(F.col("n_chars") >= 150, F.split("text", " "))
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id", F.posexplode_outer("toks").alias("pos", "tok")
    ).orderBy(
        "doc_id", F.col("pos").asc_nulls_first(), F.col("tok").asc_nulls_first()
    )


@register(
    "h14_map_ops",
    survey_id="H14",
    category="scalar",
    oracle="""
SELECT event_id,
       list_sort(map_keys(MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)})) AS ks,
       MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)}['type'][1] AS type_val
FROM events ORDER BY event_id
""",
)
def h14_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction / keys / element access. Key order is
    insertion-defined in both engines but sorted anyway (SURVEY H14);
    DuckDB map extraction returns a list — oracle unwraps [1]."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return e.select(
        "event_id",
        F.sort_array(F.map_keys(m)).alias("ks"),
        F.element_at(m, "type").alias("type_val"),
    ).orderBy("event_id")


@register(
    "h15_json_ops",
    survey_id="H15",
    category="scalar",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
       to_json(struct_pack(id := event_id, k := CAST(json_extract(props, '$.k') AS INTEGER))) AS as_json
FROM events ORDER BY event_id
""",
)
def h15_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (get_json_object / from_json) and generation
    (to_json) over the events.props JSON strings."""
    e = load_table(spark, sf_dir, "events")
    k_int = F.from_json("props", "k INT")["k"]
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), k_int.alias("k"))
        ).alias("as_json"),
    ).orderBy("event_id")


@register(
    "h16_struct_ops",
    survey_id="H16",
    category="scalar",
    oracle="""
WITH t AS (SELECT o_orderkey,
                  struct_pack(status := o_orderstatus, price := o_totalprice) AS s
           FROM orders)
SELECT o_orderkey,
       s.status AS status_field,
       s.price AS price_field,
       to_json(s) AS s_json
FROM t ORDER BY o_orderkey
""",
)
def h16_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct build, dot access, to_json round-trip (scalars projected out
    so renderers never compare raw structs)."""
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    t = o.select("o_orderkey", s.alias("s"))
    return t.select(
        "o_orderkey",
        F.col("s.status").alias("status_field"),
        F.col("s.price").alias("price_field"),
        F.to_json("s").alias("s_json"),
    ).orderBy("o_orderkey")


@register(
    "h17_conditional",
    survey_id="H17",
    category="scalar",
    oracle="""
SELECT event_id,
       IF(value > 100, 'big', 'small') AS size_class,
       CASE WHEN event_type = 'purchase' THEN value ELSE 0 END AS purchase_value,
       GREATEST(value, 50.0) AS at_least_50,
       LEAST(CAST(user_id AS DOUBLE), value) AS min_mixed
FROM events ORDER BY event_id
""",
)
def h17_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions incl. greatest/least over mixed types
    (explicitly cast — implicit promotion rules differ across engines)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.when(F.col("value") > 100, "big").otherwise("small").alias(
            "size_class"
        ),
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .otherwise(F.lit(0.0))
        .alias("purchase_value"),
        F.greatest(F.col("value"), F.lit(50.0)).alias("at_least_50"),
        F.least(F.col("user_id").cast("double"), F.col("value")).alias(
            "min_mixed"
        ),
    ).orderBy("event_id")


@register(
    "h19_bitwise",
    survey_id="H19",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS k_and,
       o_orderkey | 4096 AS k_or,
       xor(o_orderkey, o_custkey) AS k_xor,
       CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INT) AS k_popcount,
       (o_orderkey & 15) << 2 AS k_shl,
       o_orderkey >> 3 AS k_shr
FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey
""",
)
def h19_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family: AND/OR/XOR, popcount, shifts — the
    building blocks of bitmap/bloom-style encodings (the SimHash and
    fingerprint ops use exactly these). Pure codegen'd column
    expressions, map-side only."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 97 == 0
    )
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(4096)).alias("k_or"),
        k.bitwiseXOR(F.col("o_custkey")).alias("k_xor"),
        F.bit_count(k).alias("k_popcount"),
        F.shiftleft(k.bitwiseAND(F.lit(15)), 2).alias("k_shl"),
        F.shiftright(k, 3).alias("k_shr"),
    ).orderBy("o_orderkey")


@register(
    "h20_variant",
    survey_id="H20",
    category="scalar",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       json_extract_string(props, '$.missing') IS NULL AS missing_is_null
FROM events WHERE event_id % 11 = 0 ORDER BY event_id
""",
)
def h20_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): parse_json once into the
    binary variant encoding, then typed path extraction via variant_get
    and null-safe try_variant_get — the shredded, codegen-friendly
    successor to repeated get_json_object string parsing. Oracle maps to
    DuckDB JSON path extraction on the same props strings."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 11 == 0)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_val"),
        F.try_variant_get(v, "$.missing", "bigint").isNull().alias(
            "missing_is_null"
        ),
    ).orderBy("event_id")


@register(
    "h21_try_arithmetic",
    survey_id="H21",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       o_totalprice / nullif(CAST(o_orderkey % 3 AS DOUBLE), 0) AS safe_div,
       TRY_CAST(o_orderpriority AS INT) AS bad_cast,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS good_cast
FROM orders WHERE o_orderkey % 101 = 0 ORDER BY o_orderkey
""",
)
def h21_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe evaluation family: try_divide yields NULL on /0 and
    try_cast yields NULL on malformed input instead of failing the whole
    100 TB job on one bad row — the ingestion-hardening surface. Oracle
    maps try_divide to x / nullif(y, 0) (DuckDB returns NULL for
    double /0 only via nullif) and try_cast to TRY_CAST."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 101 == 0
    )
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 3).cast("double")
        ).alias("safe_div"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias(
            "good_cast"
        ),
    ).orderBy("o_orderkey")


@register(
    "h22_parse_url",
    survey_id="H22",
    category="scalar",
    oracle="""
SELECT doc_id,
       source || '.example.com' AS host,
       '/docs/' || CAST(doc_id AS VARCHAR) AS path,
       lang AS lang_param
FROM documents WHERE doc_id % 13 = 0 ORDER BY doc_id
""",
)
def h22_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (parse_url): HOST / PATH / QUERY-parameter extraction
    from URLs constructed out of document fields. The Spark side
    genuinely parses; the oracle recomputes the expected components from
    the same source columns, so the check pins parser semantics without
    needing a DuckDB URL parser. Map-side codegen'd expressions."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 13 == 0
    )
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


@register(
    "h23_base_conversion",
    survey_id="H23",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       lower(to_hex(o_orderkey)) AS k_hex,
       bin(o_orderkey) AS k_bin,
       unhex(to_hex(o_orderkey + 256)) AS roundtrip_bytes
FROM orders WHERE o_orderkey % 151 = 0 ORDER BY o_orderkey
""",
)
def h23_base_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base conversion family: hex / binary rendering and the
    unhex round trip (hex digits lowercased — Spark renders lower,
    DuckDB upper). Codegen'd map-side string ops."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 151 == 0
    )
    return o.select(
        "o_orderkey",
        F.lower(F.hex("o_orderkey")).alias("k_hex"),
        F.bin("o_orderkey").alias("k_bin"),
        F.unhex(F.hex(F.col("o_orderkey") + 256)).alias("roundtrip_bytes"),
    ).orderBy("o_orderkey")


@register(
    "h24_string_parts",
    survey_id="H24",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       split_part(o_orderpriority, '-', 1) AS prio_code,
       split_part(o_orderpriority, '-', 2) AS prio_name,
       left(o_orderpriority, 3) AS l3,
       right(o_orderpriority, 3) AS r3
FROM orders WHERE o_orderkey % 113 = 0 ORDER BY o_orderkey
""",
)
def h24_string_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimited-field extraction: split_part plus left/right slices —
    the everyday parsing trio, identical names in both engines.
    Map-side codegen."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 113 == 0
    )
    p = F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.split_part(p, F.lit("-"), F.lit(1)).alias("prio_code"),
        F.split_part(p, F.lit("-"), F.lit(2)).alias("prio_name"),
        F.left(p, F.lit(3)).alias("l3"),
        F.right(p, F.lit(3)).alias("r3"),
    ).orderBy("o_orderkey")


@register(
    "h25_trig_math",
    survey_id="H25",
    category="scalar",
    oracle="""
SELECT p_partkey,
       CAST(CAST(sin(radians(p_size * 7)) AS DECIMAL(18,6)) AS DOUBLE) AS s,
       CAST(CAST(cos(radians(p_size * 7)) AS DECIMAL(18,6)) AS DOUBLE) AS c,
       CAST(CAST(atan2(p_size, 10.0) AS DECIMAL(18,6)) AS DOUBLE) AS a2,
       CAST(CAST(degrees(atan(p_size / 50.0)) AS DECIMAL(18,6)) AS DOUBLE)
         AS deg
FROM part WHERE p_partkey % 37 = 0 ORDER BY p_partkey
""",
)
def h25_trig_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric family (sin/cos/atan2/atan, radians/degrees).
    libm implementations differ by ulps between engines, so outputs
    round through DECIMAL(18,6) — the H-family discipline for
    transcendentals (same as log2 in the entropy query)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 37 == 0)
    return p.select(
        "p_partkey",
        F.sin(F.radians(F.col("p_size") * 7))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("s"),
        F.cos(F.radians(F.col("p_size") * 7))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("c"),
        F.atan2(F.col("p_size").cast("double"), F.lit(10.0))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("a2"),
        F.degrees(F.atan(F.col("p_size") / 50.0))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("deg"),
    ).orderBy("p_partkey")


@register(
    "h26_base64_codec",
    survey_id="H26",
    category="scalar",
    oracle="""
SELECT doc_id,
       to_base64(CAST(substr(text, 1, 24) AS BLOB)) AS b64,
       decode(from_base64(to_base64(CAST(substr(text, 1, 24) AS BLOB))))
         AS roundtrip
FROM documents WHERE doc_id % 17 = 0 ORDER BY doc_id
""",
)
def h26_base64_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 encode/decode round trip over text prefixes — the wire
    encoding for binary payloads in JSON/text channels (multimodal
    metadata sidecars use exactly this). Map-side codegen."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 17 == 0
    )
    prefix = F.substring("text", 1, 24)
    b64 = F.base64(prefix.cast("binary"))
    return d.select(
        "doc_id",
        b64.alias("b64"),
        F.decode(F.unbase64(b64), "UTF-8").alias("roundtrip"),
    ).orderBy("doc_id")


@register(
    "h27_xml_roundtrip",
    survey_id="EXT-XML",
    category="scalar",
    oracle="""
SELECT c_custkey, c_name,
       CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM customer ORDER BY c_custkey
""",
)
def h27_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML as a first-class serde (Spark 4 `to_xml`/`from_xml`): every
    customer row is rendered to an XML document string and parsed back
    through an explicit schema; the output is the ROUNDTRIPPED fields,
    hash-checked against the source values read directly. This pins the
    lossless to_xml→from_xml contract — bigint and string survive
    textually, and the double survives because Java's shortest-roundtrip
    double formatting parses back to the identical bit pattern. Scale:
    both directions are JVM expression-tree functions (no UDF boundary),
    per-row and shuffle-free."""
    c = load_table(spark, sf_dir, "customer")
    xml = c.select(
        F.to_xml(
            F.struct("c_custkey", "c_name", "c_acctbal")
        ).alias("doc")
    )
    parsed = xml.select(
        F.from_xml(
            "doc", "c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE"
        ).alias("r")
    )
    return parsed.select(
        F.col("r.c_custkey").alias("c_custkey"),
        F.col("r.c_name").alias("c_name"),
        F.floor(F.col("r.c_acctbal") * 100)
        .cast("bigint")
        .alias("acctbal_cents"),
    ).orderBy("c_custkey")


@register(
    "h28_try_functions",
    survey_id="EXT-TRY",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 3 = 0 THEN NULL
            ELSE o_totalprice / (o_orderkey % 3) END AS safe_div,
       TRY_CAST(o_orderpriority AS INT) AS safe_cast,
       CASE WHEN o_orderkey > 7 THEN NULL
            ELSE o_orderkey + 9223372036854775800 END AS safe_add,
       CASE WHEN o_orderkey % 5 = 0
            THEN 'x' ELSE CAST(NULL AS VARCHAR) END AS safe_elem
FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey
""",
)
def h28_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode safe-expression family (`try_divide` / `try_cast`
    / `try_add` / `try_element_at`): under Spark 4's default ANSI mode,
    division by zero, numeric overflow, malformed casts and
    out-of-bounds subscripts all RAISE — the try_ variants return NULL
    instead, which is the contract batch pipelines over dirty data
    need (one bad row must not kill a 100 TB job). Each NULL-producing
    condition here is data-driven (zero divisors from a modulus,
    bigint overflow past MAX-7, an unparseable priority string, an
    out-of-range array index), and the oracle restates the NULL
    semantics as explicit CASE guards."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 97 == 0
    )
    arr = F.array(F.lit("x"))
    return o.select(
        "o_orderkey",
        F.try_divide("o_totalprice", F.col("o_orderkey") % 3).alias(
            "safe_div"
        ),
        F.expr("try_cast(o_orderpriority AS INT)").alias("safe_cast"),
        F.try_add(
            "o_orderkey", F.lit(9223372036854775800).cast("bigint")
        ).alias("safe_add"),
        F.try_element_at(
            arr, (F.col("o_orderkey") % 5 + 1).cast("int")
        ).alias("safe_elem"),
    ).orderBy("o_orderkey")


@register(
    "h29_collation",
    survey_id="EXT-COLLATE",
    category="scalar",
    oracle="""
WITH v AS (
  SELECT c_custkey, lower(c_mktsegment) AS seg,
         CASE c_custkey % 3
           WHEN 0 THEN upper(c_mktsegment)
           WHEN 1 THEN lower(c_mktsegment)
           ELSE upper(substr(c_mktsegment, 1, 1))
                || lower(substr(c_mktsegment, 2))
         END AS mixed
  FROM customer
)
SELECT seg, COUNT(DISTINCT mixed) AS nd_binary,
       COUNT(DISTINCT lower(mixed)) AS nd_lcase,
       COUNT(*) AS n_rows
FROM v GROUP BY seg ORDER BY seg
""",
)
def h29_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): the same segment rendered in three
    case styles counts as THREE distinct values under binary collation
    but ONE under `COLLATE UTF8_LCASE` — collation-aware equality wired
    into the aggregate itself, not a lower() rewrite at every call site
    (and unlike the rewrite, collated comparisons keep the original
    strings for output and can use collation-aware sort orders). The
    oracle models UTF8_LCASE with lower() — equivalent for ASCII
    segment names. Distinct counts are exact integers; hash mode."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        WITH v AS (
          SELECT c_custkey, lower(c_mktsegment) AS seg,
                 CASE pmod(c_custkey, 3)
                   WHEN 0 THEN upper(c_mktsegment)
                   WHEN 1 THEN lower(c_mktsegment)
                   ELSE concat(upper(substr(c_mktsegment, 1, 1)),
                               lower(substr(c_mktsegment, 2)))
                 END AS mixed
          FROM customer
        )
        SELECT seg, COUNT(DISTINCT mixed) AS nd_binary,
               COUNT(DISTINCT (mixed COLLATE UTF8_LCASE)) AS nd_lcase,
               COUNT(*) AS n_rows
        FROM v GROUP BY seg ORDER BY seg
        """
    )


@register(
    "h31_variant_type",
    survey_id="EXT-VARIANT",
    category="scalar",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
       CAST(json_extract(props, '$.k') AS BIGINT) % 7 = 0 AS k_div7,
       json_extract(props, '$.missing') IS NULL AS missing_is_null
FROM events WHERE user_id % 40 = 0 ORDER BY event_id
""",
)
def h31_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT type — the engine's native semi-structured
    column: parse_json lifts the props JSON string into a binary
    variant, variant_get extracts typed paths without re-parsing per
    access, and absent paths surface NULL (try-semantics on the typed
    cast). DuckDB's JSON type plays the oracle role. Scale: VARIANT's
    point is columnar shredded storage + lazy path access — per-row
    JSON parse happens ONCE at ingest instead of per expression; all
    ops here are row-local, no shuffle."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("user_id") % 40 == 0
    )
    v = e.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k_val"),
        (F.variant_get("v", "$.k", "bigint") % 7 == 0).alias("k_div7"),
        F.variant_get("v", "$.missing", "string")
        .isNull()
        .alias("missing_is_null"),
    ).orderBy("event_id")


@register(
    "h32_mask_pii",
    survey_id="EXT-MASK",
    category="scalar",
    oracle="""
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(
         c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n',
         'g') AS masked_default,
       regexp_replace(regexp_replace(
         c_name, '[A-Za-z]', '*', 'g'), '[0-9]', '#', 'g')
         AS masked_custom,
       len(c_name) AS n_chars
FROM customer WHERE c_custkey % 50 = 0 ORDER BY c_custkey
""",
)
def h32_mask_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mask() column-masking function (Spark 3.4+) — the built-in
    for PII-safe display layers (ext_pii_redaction handles detection;
    this is the formatting half): default masking maps upper→X,
    lower→x, digit→n preserving length and punctuation, and the
    custom-character form collapses letters/digits to fixed symbols.
    The oracle restates both as regexp_replace chains — which IS the
    documented semantics. Row-local, codegen-friendly; at 100 TB
    masking belongs in the view layer so raw columns never leave the
    table."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 50 == 0
    )
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_default"),
        F.mask(
            "c_name",
            upperChar=F.lit("*"),
            lowerChar=F.lit("*"),
            digitChar=F.lit("#"),
        ).alias("masked_custom"),
        F.length("c_name").cast("bigint").alias("n_chars"),
    ).orderBy("c_custkey")


@register(
    "h33_interval_arith",
    survey_id="H33",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
         AS plus_month,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
         AS plus_quarter,
       CAST(CAST(o_orderdate AS DATE) + 90 AS DATE) AS plus_90d,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
         AS month_start,
       CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
         AS quarter_start,
       CAST(DATE '1998-01-01' - CAST(o_orderdate AS DATE) AS BIGINT)
         AS days_to_98
FROM orders
WHERE o_orderkey % 13 = 0
ORDER BY o_orderkey
""",
)
def h33_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar interval arithmetic — the month/day duality every date
    dimension needs handled correctly: month addition CLAMPS to the
    end of shorter months (Jan 31 + 1 month = Feb 29 in a leap year —
    add_months and DuckDB's INTERVAL agree on the clamp, which is
    exactly what this query pins), day addition is plain linear
    date_add, last_day/trunc give month and quarter boundaries, and
    date subtraction yields exact day counts. All JVM-side codegen
    date kernels (no timezone sensitivity: inputs are cast to DATE
    first, session is UTC-pinned by the registry wrapper)."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 13 == 0
    )
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.add_months(d, 1).alias("plus_month"),
        F.add_months(d, 3).alias("plus_quarter"),
        F.date_add(d, 90).alias("plus_90d"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "month").alias("month_start"),
        F.trunc(d, "quarter").alias("quarter_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), d)
        .cast("bigint")
        .alias("days_to_98"),
    ).orderBy("o_orderkey")


@register(
    "h34_timezone_conversion",
    survey_id="H34",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       o_orderdate AS utc_ts,
       timezone('America/New_York', timezone('UTC', o_orderdate))
         AS ny_local,
       timezone('Asia/Tokyo', timezone('UTC', o_orderdate))
         AS tokyo_local,
       timezone('UTC', timezone('Europe/Paris', o_orderdate))
         AS if_paris_to_utc,
       CAST(EXTRACT(hour FROM timezone('America/New_York',
                    timezone('UTC', o_orderdate))) AS INT) AS ny_hour,
       timezone('America/New_York', timezone('UTC', o_orderdate))
         <> o_orderdate - INTERVAL 5 HOUR AS ny_was_dst
FROM orders
WHERE o_orderkey % 17 = 0
ORDER BY o_orderkey
""",
)
def h34_timezone_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IANA timezone conversion — from_utc_timestamp / to_utc_timestamp
    across three zones, with the orders table's multi-year date span
    deliberately crossing DST transitions (midnight UTC lands at 19:00
    OR 20:00 New York wall time depending on the season; the ny_was_dst
    flag pins the offset actually applied per row, so a tz database
    regression fails loudly, not silently). The oracle composes
    DuckDB's session-independent double-timezone form (timezone(tz,
    timezone('UTC', ts)) ≡ from_utc_timestamp; the inverse order ≡
    to_utc_timestamp) — both engines resolve the SAME IANA rules for
    1995-1998. JVM-side codegen; no UDF, no session-timezone
    dependence in either engine."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 17 == 0
    )
    ts = F.col("o_orderdate")
    ny = F.from_utc_timestamp(ts, "America/New_York")
    return o.select(
        "o_orderkey",
        ts.alias("utc_ts"),
        ny.alias("ny_local"),
        F.from_utc_timestamp(ts, "Asia/Tokyo").alias("tokyo_local"),
        F.to_utc_timestamp(ts, "Europe/Paris").alias("if_paris_to_utc"),
        F.hour(ny).cast("int").alias("ny_hour"),
        (ny != ts - F.expr("INTERVAL 5 HOURS")).alias("ny_was_dst"),
    ).orderBy("o_orderkey")


@register(
    "h36_printf_formatting",
    survey_id="H36",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       printf('%08d', o_orderkey) AS padded_key,
       printf('%s:%d', o_orderstatus, o_orderkey % 100) AS tagged,
       printf('%.2f', o_totalprice) AS price_2dp,
       printf('%x', o_orderkey) AS hex_key
FROM orders WHERE o_orderkey % 19 = 0
ORDER BY o_orderkey
""",
)
def h36_printf_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style string formatting — report/export rendering
    without UDFs: zero-padded integers, mixed-type templates, fixed
    2-decimal rendering of doubles (both engines round-half-up the
    same IEEE double, so even the decimal string agrees), and hex
    rendering. Spark's format_string and DuckDB's printf share the C
    printf dialect, making the surface directly oracle-checkable.
    JVM-side codegen, map-side only."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 19 == 0
    )
    return o.select(
        "o_orderkey",
        F.format_string("%08d", "o_orderkey").alias("padded_key"),
        F.format_string(
            "%s:%d", F.col("o_orderstatus"), F.col("o_orderkey") % 100
        ).alias("tagged"),
        F.format_string("%.2f", "o_totalprice").alias("price_2dp"),
        F.format_string("%x", "o_orderkey").alias("hex_key"),
    ).orderBy("o_orderkey")


@register(
    "h37_map_higher_order",
    survey_id="H37",
    category="scalar",
    oracle="""
WITH pre AS (
  SELECT l_orderkey, l_linenumber,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem WHERE l_orderkey % 31 = 0
  GROUP BY l_orderkey, l_linenumber
)
SELECT l_orderkey,
       l_linenumber + 100 AS shifted_line,
       cents * 2 + qty AS combined
FROM pre
WHERE cents * 2 + qty > 4000000
ORDER BY l_orderkey, shifted_line
""",
)
def h37_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over MAP columns — the lambda surface
    H12 gives arrays, completed for maps: each order's lineitems
    collapse into two maps (linenumber → cents, linenumber →
    quantity) via map_from_entries, then map_zip_with combines them
    key-wise (2·cents + qty), map_filter prunes small entries, and
    transform_keys shifts the key space — all lambdas running inside
    codegen, no explode-regroup round trip (the naive spelling would
    shuffle twice; the map pipeline shuffles once to build the maps
    and never again). The oracle states the same computation
    relationally over the raw rows — proving the map algebra equals
    its relational semantics. Final explode is presentation only."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 31 == 0
    )
    # this testdata reuses l_linenumber within an order — pre-aggregate
    # to a unique map key (duplicate map keys are an error in Spark 4)
    pre = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("qty"),
    )
    m = pre.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct("l_linenumber", "cents"))
        ).alias("cents_map"),
        F.map_from_entries(
            F.collect_list(F.struct("l_linenumber", "qty"))
        ).alias("qty_map"),
    )
    combined = F.map_zip_with(
        "cents_map", "qty_map", lambda k, a, b: a * 2 + b
    )
    filtered = F.map_filter(combined, lambda k, v: v > 4_000_000)
    shifted = F.transform_keys(filtered, lambda k, v: k + 100)
    return (
        m.select(
            "l_orderkey", F.explode(shifted).alias("shifted_line", "combined")
        )
        .orderBy("l_orderkey", "shifted_line")
    )


@register(
    "h38_luhn_check",
    survey_id="H38",
    category="scalar",
    oracle="""
WITH acct AS (
  SELECT c_custkey, 400000000000 + c_custkey * 37 AS body
  FROM customer
),
digits AS (
  SELECT c_custkey, body, d.i,
         (body // CAST(pow(10e0, d.i) AS BIGINT)) % 10 AS dig
  FROM acct CROSS JOIN generate_series(0, 11) AS d(i)
),
weighted AS (
  SELECT c_custkey, body,
         SUM(CASE WHEN i % 2 = 0
                  THEN CASE WHEN dig * 2 > 9 THEN dig * 2 - 9
                            ELSE dig * 2 END
                  ELSE dig END) AS s
  FROM digits GROUP BY c_custkey, body
),
checked AS (
  SELECT c_custkey, body, (10 - s % 10) % 10 AS check_digit,
         body * 10 + (10 - s % 10) % 10 AS full_number
  FROM weighted
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_accounts,
       CAST(SUM(check_digit) AS BIGINT) AS check_digit_sum,
       CAST(SUM(full_number % 97) AS BIGINT) AS number_checksum,
       CAST(SUM(CASE WHEN check_digit = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_checks
FROM checked
""",
)
def h38_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn check-digit computation (ISO/IEC 7812 — card/IMEI/account
    validation) as pure integer SQL: 12-digit account bodies derive
    from custkey, each digit extracts arithmetically (no string ops —
    body div 10^i mod 10 stays in codegen), even positions double
    with the casting-out-nines fold (2d-9 when 2d>9), and the check
    digit closes the sum to a multiple of 10. The data-quality gate
    that catches corrupted identifiers at ingest, here computed and
    checksummed over every customer in one map-side pass + one
    aggregate. Digit extraction via a 12-element explode keeps both
    engines on the identical integer expression."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    acct = c.select(
        "c_custkey",
        (F.lit(400000000000) + F.col("c_custkey") * 37).alias("body"),
    )
    digits = acct.select(
        "c_custkey",
        "body",
        F.explode(F.array(*[F.lit(i) for i in range(12)])).alias("i"),
    ).select(
        "c_custkey",
        "body",
        "i",
        F.expr("(body div cast(pow(10.0, i) as bigint)) % 10").alias(
            "dig"
        ),
    )
    weighted = digits.groupBy("c_custkey", "body").agg(
        F.sum(
            F.when(
                F.col("i") % 2 == 0,
                F.when(
                    F.col("dig") * 2 > 9, F.col("dig") * 2 - 9
                ).otherwise(F.col("dig") * 2),
            ).otherwise(F.col("dig"))
        ).alias("s")
    )
    checked = weighted.select(
        "c_custkey",
        "body",
        ((10 - F.col("s") % 10) % 10).alias("check_digit"),
    ).withColumn(
        "full_number", F.col("body") * 10 + F.col("check_digit")
    )
    return checked.agg(
        F.count("*").cast("bigint").alias("n_accounts"),
        F.sum("check_digit").cast("bigint").alias("check_digit_sum"),
        F.sum(F.col("full_number") % 97)
        .cast("bigint")
        .alias("number_checksum"),
        F.sum(F.when(F.col("check_digit") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_checks"),
    )
