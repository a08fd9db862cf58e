package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar function surface — the TiDB builtin families
  * (reference: /root/reference/expression/builtin_control.go,
  * builtin_string.go, builtin_like.go, builtin_math.go,
  * builtin_time.go, builtin_cast.go, builtin_json.go,
  * builtin_encryption.go) expressed with codegen'd
  * `org.apache.spark.sql.functions` — no UDFs anywhere, so every
  * query stays inside WholeStageCodegen.
  *
  * Oracle-parity notes: engine-divergent return widths are pinned
  * (INT vs BIGINT), libm-backed functions (exp/ln/pow) are rounded
  * to 6dp, and double→string casts avoided in favor of
  * decimal→string.
  */
object Scalars {

  val all: Seq[Q] = Seq(

    // Control flow: CASE/WHEN, COALESCE, NULLIF (builtin_control.go).
    Q("q_func_control", Some("""
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN 'mid'
                  ELSE 'high' END AS bal_band,
             COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_alias,
             CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal ELSE -c_acctbal END AS signed_bal
      FROM customer WHERE c_custkey < 200
    """)) { t =>
      t.customer.filter(col("c_custkey") < 200)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bal_band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
            .as("seg_alias"),
          when(col("c_nationkey") % 2 === 0, col("c_acctbal"))
            .otherwise(-col("c_acctbal")).as("signed_bal"))
    },

    // String functions (builtin_string.go).
    Q("q_func_string", Some("""
      SELECT p_partkey,
             CONCAT(p_brand, '-', p_type) AS brand_type,
             UPPER(p_type) AS type_up, LOWER(p_name) AS name_lo,
             SUBSTR(p_name, 1, 5) AS name_pfx,
             CAST(LENGTH(p_name) AS INT) AS name_len,
             LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
             REPLACE(p_type, 'ECONOMY', 'ECO') AS type_short,
             REVERSE(p_brand) AS brand_rev,
             LEFT(p_name, 3) AS name_l3, RIGHT(p_name, 3) AS name_r3,
             CAST(INSTR(p_name, 'a') AS INT) AS pos_a,
             REPEAT(SUBSTR(p_brand, 1, 2), 2) AS brand2,
             CAST(ASCII(p_name) AS INT) AS first_cp
      FROM part WHERE p_partkey < 300
    """)) { t =>
      t.part.filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
          upper(col("p_type")).as("type_up"),
          lower(col("p_name")).as("name_lo"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          length(col("p_name")).as("name_len"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          regexp_replace(col("p_type"), "ECONOMY", "ECO").as("type_short"),
          reverse(col("p_brand")).as("brand_rev"),
          expr("left(p_name, 3)").as("name_l3"),
          expr("right(p_name, 3)").as("name_r3"),
          instr(col("p_name"), "a").as("pos_a"),
          repeat(substring(col("p_brand"), 1, 2), 2).as("brand2"),
          ascii(col("p_name")).as("first_cp"))
    },

    // LIKE / REGEXP (builtin_like.go): both engines are
    // case-sensitive; regexp_extract group semantics are shared.
    Q("q_func_like", Some("""
      SELECT p_partkey, p_brand, p_type,
             CAST(p_type LIKE 'S%' AS INT) AS is_s,
             CAST(p_type LIKE '%ONOM%' AS INT) AS has_onom,
             CAST(regexp_matches(p_brand, '^Brand#[0-9]$') AS INT) AS single_digit,
             regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel
      FROM part WHERE p_partkey < 300
    """)) { t =>
      t.part.filter(col("p_partkey") < 300)
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_type").like("S%").cast("int").as("is_s"),
          col("p_type").like("%ONOM%").cast("int").as("has_onom"),
          col("p_brand").rlike("^Brand#[0-9]$").cast("int").as("single_digit"),
          regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brand_num"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("name_novowel"))
    },

    // Math functions (builtin_math.go). floor/ceil pinned to BIGINT;
    // exp/ln/log libm results rounded to 6dp.
    Q("q_func_math", Some("""
      SELECT l_orderkey, l_linenumber,
             ABS(l_extendedprice - 50000) AS abs_dev,
             CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
             CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
             ROUND(l_extendedprice, 1) AS price_r1,
             l_orderkey % 7 AS key_mod,
             SQRT(l_extendedprice) AS price_sqrt,
             ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
             ROUND(LOG10(l_extendedprice + 1), 6) AS price_log10,
             ROUND(EXP(l_discount), 6) AS disc_exp,
             ROUND(POW(l_quantity, 2), 6) AS qty_sq,
             CAST(SIGN(l_extendedprice - 30000) AS INT) AS dev_sign,
             GREATEST(l_quantity, 25.0) AS qty_hi,
             LEAST(l_quantity, 25.0) AS qty_lo
      FROM lineitem WHERE l_orderkey < 500
    """)) { t =>
      t.lineitem.filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_extendedprice") - 50000).as("abs_dev"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          round(col("l_extendedprice"), 1).as("price_r1"),
          (col("l_orderkey") % 7).as("key_mod"),
          sqrt(col("l_extendedprice")).as("price_sqrt"),
          round(log(col("l_extendedprice") + 1), 6).as("price_ln"),
          round(log10(col("l_extendedprice") + 1), 6).as("price_log10"),
          round(exp(col("l_discount")), 6).as("disc_exp"),
          round(pow(col("l_quantity"), 2), 6).as("qty_sq"),
          signum(col("l_extendedprice") - 30000).cast("int").as("dev_sign"),
          greatest(col("l_quantity"), lit(25.0)).as("qty_hi"),
          least(col("l_quantity"), lit(25.0)).as("qty_lo"))
    },

    // Date/time functions (builtin_time.go). Day-of-week mapped via
    // ISO numbering (Spark weekday+1 == DuckDB isodow).
    Q("q_func_time", Some("""
      SELECT o_orderkey,
             CAST(YEAR(o_orderdate) AS INT) AS yr,
             CAST(QUARTER(o_orderdate) AS INT) AS qtr,
             CAST(MONTH(o_orderdate) AS INT) AS mo,
             CAST(DAY(o_orderdate) AS INT) AS dom,
             CAST(ISODOW(o_orderdate) AS INT) AS dow_iso,
             CAST(WEEKOFYEAR(o_orderdate) AS INT) AS wk,
             CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
             CAST(o_orderdate AS DATE) + 30 AS due_date,
             LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
             STRFTIME(o_orderdate, '%Y-%m') AS ym,
             CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s
      FROM orders WHERE o_orderkey < 500
    """)) { t =>
      t.orders.filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          (weekday(col("o_orderdate")) + 1).as("dow_iso"),
          weekofyear(col("o_orderdate")).as("wk"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .as("days_since"),
          date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
          last_day(col("o_orderdate").cast("date")).as("month_end"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
    },

    // Cast matrix (builtin_cast.go). double→string goes through
    // DECIMAL(18,2) so both engines print identically.
    Q("q_func_cast", Some("""
      SELECT c_custkey,
             CAST(c_custkey AS VARCHAR) AS key_str,
             CAST(SUBSTR(c_name, 10) AS BIGINT) AS name_num,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS bal_str,
             CAST(c_nationkey AS DOUBLE) AS nk_d,
             CAST(c_acctbal > 0 AS INT) AS pos_flag
      FROM customer WHERE c_custkey < 300
    """)) { t =>
      t.customer.filter(col("c_custkey") < 300)
        .select(col("c_custkey"),
          col("c_custkey").cast("string").as("key_str"),
          substring(col("c_name"), 10, 100).cast("long").as("name_num"),
          Exact.dec2(col("c_acctbal")).cast("string").as("bal_str"),
          col("c_nationkey").cast("double").as("nk_d"),
          (col("c_acctbal") > 0).cast("int").as("pos_flag"))
    },

    // JSON path extraction (builtin_json.go) over events.props.
    Q("q_func_json", Some("""
      SELECT event_type,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
             COUNT(*) AS n
      FROM events GROUP BY event_type
    """)) { t =>
      // Parse the JSON once per row in a pre-agg projection (fanned
      // across cores) — inlining `k` into both aggregates re-runs the
      // path parse per aggregate per row.
      t.fan(t.events)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type").agg(
          sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
          count(lit(1)).as("n"))
    },

    // Hash/digest functions (builtin_encryption.go): md5 + sha256,
    // lowercase hex on both engines.
    Q("q_func_crypto", Some("""
      SELECT c_custkey, MD5(c_name) AS name_md5, SHA256(c_name) AS name_sha
      FROM customer WHERE c_custkey < 100
    """)) { t =>
      t.customer.filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          md5(col("c_name").cast("binary")).as("name_md5"),
          sha2(col("c_name").cast("binary"), 256).as("name_sha"))
    },
  )
}
