package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Second wave of scalar-function coverage (reference:
  * /root/reference/expression/builtin_string.go, builtin_like.go,
  * builtin_time.go, builtin_json.go families not yet exercised by
  * Scalars.scala). All codegen'd builtins, no UDFs; oracle SQL uses
  * the DuckDB spelling of each function (e.g. `\1` vs `$1` backrefs,
  * `string_split_regex` vs `split`) — only results are compared.
  */
object Scalars2 {

  val all: Seq[Q] = Seq(

    // String family 2: translate/split_part/levenshtein/contains/
    // starts_with/bit_length/octet_length/chr/printf-format.
    Q("q_func_string2", Some("""
      SELECT c_custkey,
             TRANSLATE(c_name, 'Ceu', 'X12') AS name_tr,
             SPLIT_PART(c_name, '#', 2) AS name_num,
             CAST(LEVENSHTEIN(c_mktsegment, 'BUILDING') AS INT) AS seg_dist,
             CAST(CONTAINS(c_name, '7') AS INT) AS has_7,
             CAST(STARTS_WITH(c_mktsegment, 'B') AS INT) AS seg_b,
             CAST(BIT_LENGTH(c_mktsegment) AS INT) AS seg_bits,
             CAST(STRLEN(c_name) AS INT) AS name_bytes,
             CHR(65 + c_nationkey % 26) AS nat_chr,
             PRINTF('%06d', c_custkey) AS key_pad,
             CONCAT_WS('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat
      FROM customer WHERE c_custkey < 300
    """)) { t =>
      t.customer.filter(col("c_custkey") < 300)
        .select(col("c_custkey"),
          translate(col("c_name"), "Ceu", "X12").as("name_tr"),
          split_part(col("c_name"), lit("#"), lit(2)).as("name_num"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).as("seg_dist"),
          contains(col("c_name"), lit("7")).cast("int").as("has_7"),
          startswith(col("c_mktsegment"), lit("B")).cast("int").as("seg_b"),
          bit_length(col("c_mktsegment")).as("seg_bits"),
          octet_length(col("c_name")).as("name_bytes"),
          chr(lit(65) + col("c_nationkey") % 26).as("nat_chr"),
          format_string("%06d", col("c_custkey")).as("key_pad"),
          concat_ws("|", col("c_mktsegment"),
            col("c_nationkey").cast("string")).as("seg_nat"))
    },

    // Regexp family 2: backreference replace, group-2 extract,
    // regex split counts, match counting.
    Q("q_func_regexp2", Some("""
      SELECT p_partkey,
             REGEXP_REPLACE(p_name, '([aeiou])', '<\1>', 'g') AS name_marked,
             regexp_extract(p_brand, '(Brand)#([0-9]+)', 2) AS brand_n,
             CAST(LEN(string_split_regex(p_name, '[aeiou]')) AS INT) AS n_vsplit,
             CAST(LEN(regexp_extract_all(p_name, '[a-z]+')) AS INT) AS n_runs,
             REGEXP_REPLACE(p_type, '^(.)(.*)$', '\2\1', 'g') AS type_rot
      FROM part WHERE p_partkey < 300
    """)) { t =>
      t.part.filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          regexp_replace(col("p_name"), "([aeiou])", "<$1>")
            .as("name_marked"),
          regexp_extract(col("p_brand"), "(Brand)#([0-9]+)", 2).as("brand_n"),
          size(split(col("p_name"), "[aeiou]")).as("n_vsplit"),
          regexp_count(col("p_name"), lit("[a-z]+")).cast("int").as("n_runs"),
          regexp_replace(col("p_type"), "^(.)(.*)$", "$2$1").as("type_rot"))
    },

    // Time family 2: last_day/date_trunc/make_date/dayofyear/
    // weekofyear/epoch seconds/strftime-format.
    Q("q_func_time2", Some("""
      SELECT o_orderkey,
             LAST_DAY(o_orderdate) AS month_end,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start,
             CAST(dayofyear(o_orderdate) AS INT) AS doy,
             CAST(weekofyear(o_orderdate) AS INT) AS woy,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             strftime(o_orderdate, '%Y-%m') AS ym,
             make_date(CAST(YEAR(o_orderdate) AS INT), 12, 1) AS year_dec
      FROM orders WHERE o_orderkey < 500
    """)) { t =>
      t.orders.filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          last_day(col("o_orderdate")).as("month_end"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_trunc("quarter", col("o_orderdate")).as("quarter_start"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("woy"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          make_date(year(col("o_orderdate")), lit(12), lit(1)).as("year_dec"))
    },

    // JSON family 2 over a constructed nested document: dotted-path
    // extraction, array length / element access, key listing.
    Q("q_func_json2", Some("""
      SELECT event_id,
             json_extract_string(doc, '$.meta.k') AS k_str,
             CAST(json_extract_string(doc, '$.meta.k') AS INT) AS k_int,
             CAST(json_array_length(doc, '$.tags') AS INT) AS n_tags,
             json_extract_string(doc, '$.tags[1]') AS tag1,
             CAST(to_json(json_keys(doc)) AS VARCHAR) AS top_keys
      FROM (SELECT event_id,
              CONCAT('{"meta":{"k":', json_extract_string(props, '$.k'),
                     ',"type":"', event_type, '"},"tags":["a","b","c"]}') AS doc
            FROM events) j
      WHERE event_id < 500
    """)) { t =>
      t.events.filter(col("event_id") < 500)
        .select(col("event_id"),
          concat(lit("{\"meta\":{\"k\":"),
            get_json_object(col("props"), "$.k"),
            lit(",\"type\":\""), col("event_type"),
            lit("\"},\"tags\":[\"a\",\"b\",\"c\"]}")).as("doc"))
        .select(col("event_id"),
          get_json_object(col("doc"), "$.meta.k").as("k_str"),
          get_json_object(col("doc"), "$.meta.k").cast("int").as("k_int"),
          json_array_length(get_json_object(col("doc"), "$.tags"))
            .as("n_tags"),
          get_json_object(col("doc"), "$.tags[1]").as("tag1"),
          to_json(json_object_keys(col("doc"))).as("top_keys"))
    },

    // JSON array unnest (json_table analog): parse an embedded array
    // and explode it with ordinality — posexplode(from_json) on the
    // Spark side, json_transform + UNNEST WITH ORDINALITY in DuckDB.
    Q("q_func_json3", Some("""
      SELECT event_id, pos, tag, CAST(LENGTH(tag) AS INT) AS tag_len
      FROM (SELECT event_id,
              CAST(unnest(generate_series(0, LEN(ta) - 1)) AS INT) AS pos,
              unnest(ta) AS tag
            FROM (SELECT event_id,
                    json_transform(CONCAT('["', event_type, '","k',
                      json_extract_string(props, '$.k'), '","x"]'),
                      '["VARCHAR"]') AS ta
                  FROM events WHERE event_id < 300) j) u
    """)) { t =>
      t.events.filter(col("event_id") < 300)
        .select(col("event_id"),
          concat(lit("[\""), col("event_type"), lit("\",\"k"),
            get_json_object(col("props"), "$.k"), lit("\",\"x\"]"))
            .as("arr"))
        .select(col("event_id"),
          posexplode(expr("from_json(arr, 'array<string>')"))
            .as(Seq("pos", "tag")))
        .select(col("event_id"), col("pos"), col("tag"),
          length(col("tag")).as("tag_len"))
    },

    // Array functions over per-order collected line numbers:
    // sort/distinct/contains/slice/reverse + element access.
    Q("q_func_array", Some("""
      SELECT l_orderkey,
             CAST(to_json(list_sort(list(l_linenumber))) AS VARCHAR) AS lines,
             CAST(LEN(list_distinct(list(l_linenumber))) AS INT) AS n_distinct,
             CAST(list_contains(list(l_linenumber), 3) AS INT) AS has_3,
             list_sort(list(l_linenumber))[1] AS first_line,
             list_reverse(list_sort(list(l_linenumber)))[1] AS last_line,
             CAST(to_json(list_slice(list_sort(list(l_linenumber)), 1, 2))
                  AS VARCHAR) AS first_two
      FROM lineitem WHERE l_orderkey < 300 GROUP BY l_orderkey
    """)) { t =>
      t.lineitem.filter(col("l_orderkey") < 300)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"),
          size(array_distinct(collect_list(col("l_linenumber"))))
            .as("n_distinct"),
          array_contains(collect_list(col("l_linenumber")), 3).cast("int")
            .as("has_3"))
        .select(col("l_orderkey"), to_json(col("lines")).as("lines"),
          col("n_distinct"), col("has_3"),
          element_at(col("lines"), 1).as("first_line"),
          element_at(reverse(col("lines")), 1).as("last_line"),
          to_json(slice(col("lines"), 1, 2)).as("first_two"))
    },

    // Bitwise operator family (builtin_op.go): AND/OR/XOR/shift/NOT.
    Q("q_func_bitops", Some("""
      SELECT l_orderkey, l_linenumber,
             l_orderkey & 255 AS k_and,
             l_orderkey | 4096 AS k_or,
             xor(l_orderkey, l_linenumber) AS k_xor,
             l_linenumber << 4 AS k_shl,
             l_orderkey >> 3 AS k_shr,
             ~l_orderkey AS k_not,
             CAST(bit_count(l_orderkey) AS INT) AS k_pop
      FROM lineitem WHERE l_orderkey < 300
    """)) { t =>
      t.lineitem.filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_orderkey").bitwiseAND(255).as("k_and"),
          col("l_orderkey").bitwiseOR(4096).as("k_or"),
          col("l_orderkey").bitwiseXOR(col("l_linenumber").cast("bigint"))
            .as("k_xor"),
          shiftleft(col("l_linenumber"), 4).as("k_shl"),
          shiftright(col("l_orderkey"), 3).as("k_shr"),
          expr("~l_orderkey").as("k_not"),
          bit_count(col("l_orderkey")).as("k_pop"))
    },

    // MySQL-family position/encoding functions (reference:
    // builtin_compare.go INTERVAL, builtin_string.go ELT/FIELD,
    // builtin_math.go CONV/HEX, builtin_miscellaneous.go
    // INET_ATON). Spark has no named twins for most of these; the
    // Spark-first forms are array element/position/filter expressions
    // and arithmetic — all codegen'd — with identical DuckDB
    // renderings (MySQL INTERVAL(N, b...) = count of bounds <= N).
    Q("q_func_mysql", Some("""
      SELECT o_orderkey,
             (['alpha', 'beta', 'gamma'])[1 + CAST(o_orderkey % 3 AS INT)]
               AS elt_val,
             CAST(list_position(['1-URGENT', '2-HIGH', '3-MEDIUM',
               '4-NOT SPECIFIED', '5-LOW'], o_orderpriority) AS INT)
               AS field_val,
             CAST(len(list_filter([50000.0, 100000.0, 150000.0],
               b -> b <= o_totalprice)) AS INT) AS interval_idx,
             UPPER(TO_HEX(o_orderkey)) AS hex_key,
             CAST(10 * 16777216 + (o_custkey % 256) * 65536
                  + (o_orderkey % 256) * 256 + 1 AS BIGINT) AS inet_num
      FROM orders WHERE o_orderkey < 300
    """)) { t =>
      val priorities = array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW").map(lit): _*)
      t.orders.filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          element_at(array(lit("alpha"), lit("beta"), lit("gamma")),
            (lit(1) + pmod(col("o_orderkey"), lit(3))).cast("int"))
            .as("elt_val"),
          array_position(priorities, col("o_orderpriority")).cast("int")
            .as("field_val"),
          size(filter(array(lit(50000.0), lit(100000.0), lit(150000.0)),
            b => b <= col("o_totalprice"))).as("interval_idx"),
          upper(hex(col("o_orderkey"))).as("hex_key"),
          (lit(10L * 16777216) + pmod(col("o_custkey"), lit(256)) * 65536 +
            pmod(col("o_orderkey"), lit(256)) * 256 + 1).cast("bigint")
            .as("inet_num"))
    },

    // Map-typed columns (reference: TiDB JSON object semantics,
    // types/json/binary.go + builtin_json.go json_keys/values over
    // objects — Spark's MapType is the columnar twin). Construction,
    // element access, keys/values, concat, filter and value
    // transformation; every map-typed output is rendered to_json so
    // the driver compare stays scalar. DuckDB's m['key'] yields a
    // one-element list → [1]; its map_filter/transform_values twins
    // are list_filter/list_transform over map_entries.
    Q("q_func_map", Some("""
      WITH m AS (
        SELECT o_orderkey,
               MAP {'s': o_orderstatus, 'p': o_orderpriority} AS ms,
               MAP {'total': CAST(ROUND(o_totalprice, 0) AS BIGINT),
                    'cust': o_custkey} AS mv
        FROM orders WHERE o_orderkey < 200)
      SELECT o_orderkey,
             CAST(to_json(ms) AS VARCHAR) AS m_js,
             ms['p'][1] AS p_val,
             CAST(cardinality(ms) AS INT) AS m_size,
             CAST(to_json(map_keys(ms)) AS VARCHAR) AS m_keys,
             CAST(to_json(map_values(mv)) AS VARCHAR) AS m_vals,
             CAST(to_json(map_concat(ms, MAP {'src': 'oltp'})) AS VARCHAR)
               AS m_plus,
             CAST(to_json(map_from_entries(list_filter(map_entries(mv),
               e -> e.value > 100))) AS VARCHAR) AS m_big,
             CAST(to_json(map_from_entries(list_transform(map_entries(mv),
               e -> struct_pack(k := e.key, v := e.value * 2)))) AS VARCHAR)
               AS m_doubled
      FROM m
    """)) { t =>
      val ms = map(lit("s"), col("o_orderstatus"),
        lit("p"), col("o_orderpriority"))
      val mv = map(lit("total"), round(col("o_totalprice"), 0).cast("bigint"),
        lit("cust"), col("o_custkey"))
      t.orders.filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          to_json(ms).as("m_js"),
          element_at(ms, "p").as("p_val"),
          size(ms).as("m_size"),
          to_json(map_keys(ms)).as("m_keys"),
          to_json(map_values(mv)).as("m_vals"),
          to_json(map_concat(ms, map(lit("src"), lit("oltp")))).as("m_plus"),
          to_json(map_filter(mv, (_, v) => v > 100)).as("m_big"),
          to_json(transform_values(mv, (_, v) => v * 2)).as("m_doubled"))
    },

    // JSON mutation family (reference: builtin_json.go JSONSetSig /
    // JSONInsertSig / JSONRemoveSig / json_merge). Spark has no
    // json_set; the declarative twin is struct surgery —
    // withField / dropFields — between from_json and to_json, which
    // stays in codegen. DuckDB's json_merge_patch is the oracle:
    // RFC 7386 patch = set/insert/merge, and a null value = remove.
    // merge_patch moves an OVERWRITTEN key to the end of the object,
    // so the Spark "set" is dropFields + withField (append), not an
    // in-place withField.
    Q("q_func_json4", Some("""
      WITH e AS (
        SELECT event_id, value,
               CAST(json_extract_string(props, '$.k') AS INT) AS k,
               json_object('k', CAST(json_extract_string(props, '$.k') AS INT),
                           'type', event_type) AS doc
        FROM events WHERE event_id < 300)
      SELECT event_id,
             CAST(doc AS VARCHAR) AS doc,
             CAST(json_merge_patch(doc, json_object('k', k * 2)) AS VARCHAR)
               AS set_k,
             CAST(json_merge_patch(doc, '{"src":"evt"}') AS VARCHAR) AS ins,
             CAST(json_merge_patch(doc, '{"type":null}') AS VARCHAR) AS rm,
             CAST(json_merge_patch(doc, json_object('q', ROUND(value, 2),
               'src', 'e')) AS VARCHAR) AS mrg
      FROM e
    """)) { t =>
      val k = get_json_object(col("props"), "$.k").cast("int")
      val base = struct(k.as("k"), col("event_type").as("type"))
      t.events.filter(col("event_id") < 300)
        .select(col("event_id"),
          to_json(base).as("doc"),
          to_json(base.dropFields("k").withField("k", k * 2)).as("set_k"),
          to_json(base.withField("src", lit("evt"))).as("ins"),
          to_json(base.dropFields("type")).as("rm"),
          to_json(base.withField("q", round(col("value"), 2))
            .withField("src", lit("e"))).as("mrg"))
    },

    // VARIANT semi-structured type (Spark 4) — the engine twin of the
    // reference's binary JSON storage (types/json/binary.go: TiDB
    // parses JSON text once into a typed binary tree and evaluates
    // paths against that). parse_json → VariantType does exactly
    // that: one parse, then typed variant_get path probes with
    // per-probe casts, all codegen'd — far cheaper than re-parsing
    // text per get_json_object at 100 TB. Output columns are plain
    // SQL types (the variant never leaves the query), so the DuckDB
    // JSON oracle compares exactly.
    Q("q_func_variant", Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
             CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
             CAST(json_extract_string(props, '$.missing') AS INT) AS k_missing,
             CAST(json_extract_string(
               json_object('meta', json_object('type', event_type,
                                               'v', ROUND(value, 2))),
               '$.meta.type') AS VARCHAR) AS nested_type,
             CAST(json_extract(
               json_object('meta', json_object('type', event_type,
                                               'v', ROUND(value, 2))),
               '$.meta.v') AS DOUBLE) AS nested_v
      FROM events WHERE event_id < 400
    """)) { t =>
      val v = parse_json(col("props"))
      val nested = parse_json(to_json(struct(struct(
        col("event_type").as("type"),
        round(col("value"), 2).as("v")).as("meta"))))
      t.events.filter(col("event_id") < 400)
        .select(col("event_id"),
          try_variant_get(v, "$.k", "int").as("k_int"),
          try_variant_get(v, "$.k", "string").as("k_str"),
          try_variant_get(v, "$.missing", "int").as("k_missing"),
          try_variant_get(nested, "$.meta.type", "string").as("nested_type"),
          try_variant_get(nested, "$.meta.v", "double").as("nested_v"))
    },

    // TRY_* error-handling family (reference: TiDB's non-strict
    // evaluation — expression/builtin_cast.go + errctx downgrade
    // cast/overflow/zero-division errors to NULL+warning when strict
    // mode is off). Spark runs ANSI-strict by default, and the try_*
    // functions are the per-expression escape hatch: malformed cast →
    // NULL, divide-by-zero → NULL, int overflow → NULL, out-of-bounds
    // index → NULL. The pipeline reality: one corrupt row must not
    // kill a 100 TB job.
    Q("q_func_try", Some("""
      SELECT c_custkey,
             TRY_CAST(c_mktsegment AS INT) AS seg_int,
             TRY_CAST(SUBSTR(c_name, 10) AS INT) AS name_num,
             c_acctbal / NULLIF(c_nationkey % 3, 0) AS div3,
             TRY_CAST(c_custkey * 10000000000 AS INT) AS ovf,
             STRING_SPLIT(c_name, '#')[3] AS elem3
      FROM customer
    """)) { t =>
      t.customer.select(col("c_custkey"),
        expr("try_cast(c_mktsegment AS int)").as("seg_int"),
        expr("try_cast(substr(c_name, 10) AS int)").as("name_num"),
        try_divide(col("c_acctbal"), col("c_nationkey") % 3).as("div3"),
        expr("try_cast(c_custkey * 10000000000 AS int)").as("ovf"),
        try_element_at(split(col("c_name"), "#"), lit(3)).as("elem3"))
    },
  )
}
