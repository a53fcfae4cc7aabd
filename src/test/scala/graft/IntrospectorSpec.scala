package graft

import graft.introspect.QueryIntrospector

/** P1/P2/P3 — Catalyst-parser extraction vs hand-derived ground truth for
  * the canned workload, plus degrade-to-empty on malformed SQL
  * (reference partitioning.py:36-37, 96-97). */
class IntrospectorSpec extends SparkSpec {

  test("DDL AS-marker extraction (P1)") {
    assert(QueryIntrospector.extractSelect(
      "CREATE MATERIALIZED VIEW v AS SELECT a FROM t;").contains("SELECT a FROM t"))
    assert(QueryIntrospector.extractSelect("SELECT 1").isEmpty)
  }

  test("join query: tables, join columns, where columns, all columns") {
    val refs = QueryIntrospector.parse(spark,
      "SELECT o_orderkey, l_quantity FROM orders JOIN lineitem ON o_orderkey = l_orderkey WHERE o_totalprice > 150000.0").get
    assert(refs.tables == Seq("orders", "lineitem"))
    assert(refs.joinColumns == Map("o_orderkey" -> 1, "l_orderkey" -> 1))
    assert(refs.whereColumns == Map("o_totalprice" -> 1))
    assert(refs.allColumns == Map(
      "o_orderkey" -> 2, "l_quantity" -> 1, "l_orderkey" -> 1, "o_totalprice" -> 1))
  }

  test("group-by query counts grouped column twice (select + grouping)") {
    val refs = QueryIntrospector.parse(spark,
      "SELECT c_mktsegment, count(*) FROM customer GROUP BY c_mktsegment").get
    assert(refs.tables == Seq("customer"))
    assert(refs.allColumns == Map("c_mktsegment" -> 2))
  }

  test("filter + limit query") {
    val refs = QueryIntrospector.parse(spark,
      "SELECT l_returnflag, sum(l_quantity) FROM lineitem WHERE l_shipdate >= DATE '1995-01-01' GROUP BY l_returnflag LIMIT 10").get
    assert(refs.tables == Seq("lineitem"))
    assert(refs.whereColumns == Map("l_shipdate" -> 1))
    assert(refs.allColumns("l_returnflag") == 2)
  }

  test("CTE, subquery, and union shapes parse without crashing") {
    val cte = QueryIntrospector.parse(spark,
      "WITH top AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 1000) " +
        "SELECT c_name FROM customer JOIN top ON c_custkey = o_custkey").get
    assert(cte.tables.contains("orders") && cte.tables.contains("customer"))
    assert(cte.whereColumns == Map("o_totalprice" -> 1))
    assert(cte.joinColumns.keySet == Set("c_custkey", "o_custkey"))

    val sub = QueryIntrospector.parse(spark,
      "SELECT * FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders)").get
    assert(sub.tables.contains("lineitem") && sub.tables.contains("orders"))

    val union = QueryIntrospector.parse(spark,
      "SELECT c_nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier").get
    assert(union.tables == Seq("customer", "supplier"))
  }

  test("malformed SQL degrades to None") {
    assert(QueryIntrospector.parse(spark, "SELEKT broken FROMM").isEmpty)
    assert(QueryIntrospector.parse(spark, "").isEmpty)
    assert(QueryIntrospector.parseDdl(spark, "no marker here").isEmpty)
  }

  test("DDL with join contributes join columns (view-usage path)") {
    val refs = QueryIntrospector.parseDdl(spark,
      graft.catalog.TableRegistry.viewDdl("lineitem")).get
    assert(refs.joinColumns == Map("l_orderkey" -> 1, "o_orderkey" -> 1))
  }

  test("CTE-in-CTE: nested WITH inside a CTE definition is fully traversed") {
    // allNodes must recurse through innerChildren (CTE defs) at every
    // depth, not just the top level — sqlglot's find_all does
    // (reference partitioning.py:87-97).
    val refs = QueryIntrospector.parse(spark,
      "WITH outer_cte AS (" +
        "  WITH inner_cte AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 1000)" +
        "  SELECT o_custkey FROM inner_cte WHERE o_custkey < 100" +
        ") SELECT c_name FROM customer JOIN outer_cte ON c_custkey = o_custkey").get
    assert(refs.tables.contains("orders"), refs.tables.toString)
    assert(refs.tables.contains("customer"), refs.tables.toString)
    // both WHERE clauses — one inside the inner CTE, one in the outer def
    assert(refs.whereColumns == Map("o_totalprice" -> 1, "o_custkey" -> 1),
      refs.whereColumns.toString)
    assert(refs.joinColumns.keySet == Set("c_custkey", "o_custkey"))
  }

  test("LATERAL VIEW explode: table and generator-input columns extracted") {
    val refs = QueryIntrospector.parse(spark,
      "SELECT doc_id, tok FROM documents " +
        "LATERAL VIEW explode(split(text, ' ')) toks AS tok WHERE doc_id > 10").get
    assert(refs.tables == Seq("documents"))
    assert(refs.whereColumns == Map("doc_id" -> 1))
    // the generator input (text) must be counted among all column refs
    assert(refs.allColumns.contains("text"), refs.allColumns.toString)
    assert(refs.allColumns.contains("doc_id"))
  }

  test("UNION inside view DDL: both branches' tables extracted") {
    val refs = QueryIntrospector.parseDdl(spark,
      "CREATE VIEW all_keys AS " +
        "SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 0 " +
        "UNION ALL SELECT s_nationkey AS k FROM supplier").get
    assert(refs.tables == Seq("customer", "supplier"))
    assert(refs.whereColumns == Map("c_acctbal" -> 1))
    assert(refs.allColumns.contains("s_nationkey"))
  }

  test("quoted identifiers: backtick-quoted names resolve to their raw text") {
    val refs = QueryIntrospector.parse(spark,
      "SELECT `weird col` FROM `my table` WHERE `weird col` > 5").get
    assert(refs.tables == Seq("my table"))
    assert(refs.whereColumns == Map("weird col" -> 1))
    assert(refs.allColumns == Map("weird col" -> 2))
  }

  test("pathological shapes degrade to None, never throw (partitioning.py:36-37)") {
    // double-quoted idents are string literals in default Spark SQL dialect;
    // a bare WITH and a dangling LATERAL VIEW must both degrade
    assert(QueryIntrospector.parse(spark, "WITH x AS (SELECT 1)").isEmpty)
    assert(QueryIntrospector.parse(spark, "SELECT FROM LATERAL VIEW").isEmpty)
    assert(QueryIntrospector.parseDdl(spark,
      "CREATE VIEW v AS SELEKT nope FROMM t").isEmpty)
  }

  test("Trino-dialect log queries extract the same refs sqlglot would (r9 #4)") {
    // the shim only engages on Spark-parse failure, so each row here is a
    // Trino-ONLY surface form; expectations are the (table, join-col,
    // where-col) rows sqlglot's permissive dialect yields
    val arrayLit = QueryIntrospector.parse(spark,
      "SELECT event_id FROM events WHERE value IN (0.1, 0.5) AND contains(ARRAY[1, 2, 3], type_id)").get
    assert(arrayLit.tables == Seq("events"))
    assert(arrayLit.whereColumns == Map("value" -> 1, "type_id" -> 1))

    val nested = QueryIntrospector.parse(spark,
      "SELECT ARRAY[ARRAY[o_orderkey], ARRAY[o_custkey]] FROM orders").get
    assert(nested.allColumns == Map("o_orderkey" -> 1, "o_custkey" -> 1))

    val quoted = QueryIntrospector.parse(spark,
      "SELECT \"weird col\" FROM \"my table\" WHERE \"weird col\" > 5 AND ARRAY[1] IS NOT NULL").get
    assert(quoted.tables == Seq("my table"))
    assert(quoted.whereColumns == Map("weird col" -> 1))

    val fetch = QueryIntrospector.parse(spark,
      "SELECT o_orderkey FROM orders ORDER BY o_totalprice FETCH FIRST 10 ROWS ONLY").get
    assert(fetch.tables == Seq("orders"))
    assert(fetch.allColumns == Map("o_orderkey" -> 1, "o_totalprice" -> 1))

    val sample = QueryIntrospector.parse(spark,
      "SELECT l_orderkey FROM lineitem TABLESAMPLE BERNOULLI(10) WHERE l_quantity > 5").get
    assert(sample.tables == Seq("lineitem"))
    assert(sample.whereColumns == Map("l_quantity" -> 1))

    val casts = QueryIntrospector.parse(spark,
      "SELECT CAST(json_parse(payload) AS JSON), CAST(o_orderkey AS VARBINARY), " +
        "CAST(o_orderdate AS TIMESTAMP(3) WITH TIME ZONE) AS json FROM orders").get
    assert(casts.tables == Seq("orders"))
    assert(casts.allColumns.keySet == Set("payload", "o_orderkey", "o_orderdate"))

    val unnest = QueryIntrospector.parse(spark,
      "SELECT doc_id, tag FROM documents CROSS JOIN UNNEST(split(text, ',')) AS t(tag) WHERE doc_id > 10").get
    assert(unnest.tables == Seq("documents"))
    assert(unnest.whereColumns == Map("doc_id" -> 1))
    assert(unnest.allColumns.contains("text"), unnest.allColumns.toString)

    val ordinal = QueryIntrospector.parse(spark,
      "SELECT tag, n FROM documents, UNNEST(split(text, ',')) WITH ORDINALITY AS t(tag, n)").get
    assert(ordinal.tables == Seq("documents"))
    assert(ordinal.allColumns.contains("text"))

    // approx_distinct needs NO translation: unresolved function names parse,
    // and the argument column is exactly what usage counting consumes
    val approx = QueryIntrospector.parse(spark,
      "SELECT approx_distinct(o_custkey) FROM orders WHERE o_totalprice > 100").get
    assert(approx.allColumns.contains("o_custkey"))

    // literal content is untouchable: the ARRAY[ inside a string literal
    // must come through verbatim while the one outside is translated
    val lit = QueryIntrospector.parse(spark,
      "SELECT o_comment FROM orders WHERE o_comment = 'keep ARRAY[1] intact' AND contains(ARRAY[2], o_orderkey)").get
    assert(lit.whereColumns == Map("o_comment" -> 1, "o_orderkey" -> 1))

    // alias positions named like Trino types are NOT rewritten
    val alias = QueryIntrospector.parse(spark,
      "SELECT o_orderkey AS json FROM orders FETCH FIRST 5 ROWS ONLY").get
    assert(alias.allColumns == Map("o_orderkey" -> 1))

    // an identifier ENDING in 'array' is a subscripted column, not a Trino
    // array literal — the boundary must keep its reference intact
    val subscript = QueryIntrospector.parse(spark,
      "SELECT id FROM t WHERE tags_array[1] = 5 FETCH FIRST 10 ROWS ONLY").get
    assert(subscript.whereColumns == Map("tags_array" -> 1), subscript.whereColumns.toString)

    // Trino's count-less FETCH FIRST ROW ONLY defaults to 1 row
    val rowOnly = QueryIntrospector.parse(spark,
      "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC FETCH FIRST ROW ONLY").get
    assert(rowOnly.tables == Seq("orders"))

    // AT TIME ZONE (r10 #4): the operator fails the plain Spark parse; the
    // shim's operator-for-operator rewrite keeps BOTH operands' refs — a
    // column-valued zone stays a counted column reference
    val atTz = QueryIntrospector.parse(spark,
      "SELECT event_id FROM events " +
        "WHERE (ts AT TIME ZONE 'UTC') > TIMESTAMP '2020-01-01 00:00:00'").get
    assert(atTz.tables == Seq("events"))
    assert(atTz.whereColumns == Map("ts" -> 1), atTz.whereColumns.toString)
    val atTzCol = QueryIntrospector.parse(spark,
      "SELECT created + INTERVAL '1' HOUR FROM sessions " +
        "WHERE (created AT TIME ZONE user_tz) > TIMESTAMP '2020-01-01 00:00:00'").get
    assert(atTzCol.whereColumns == Map("created" -> 1, "user_tz" -> 1),
      atTzCol.whereColumns.toString)
    // …while a literal containing the operator text stays verbatim
    val atTzLit = QueryIntrospector.parse(spark,
      "SELECT o_comment FROM orders WHERE o_comment = 'x AT TIME ZONE y'").get
    assert(atTzLit.whereColumns == Map("o_comment" -> 1))

    // function-call-shaped Trino forms need NO rewrite: ROW(…) value
    // constructors and TRY(…) parse in Spark dialect as unresolved
    // functions with their argument columns intact
    val rowCtor = QueryIntrospector.parse(spark,
      "SELECT o_orderkey FROM orders WHERE ROW(o_custkey, o_clerk) = ROW(1, 'Clerk#1')").get
    assert(rowCtor.tables == Seq("orders"))
    assert(rowCtor.whereColumns == Map("o_custkey" -> 1, "o_clerk" -> 1),
      rowCtor.whereColumns.toString)
    val tryFn = QueryIntrospector.parse(spark,
      "SELECT TRY(100.0 / value) FROM events WHERE TRY(CAST(props AS JSON)) IS NOT NULL").get
    assert(tryFn.tables == Seq("events"))
    assert(tryFn.whereColumns == Map("props" -> 1))
    assert(tryFn.allColumns.contains("value"))

    // LISTAGG … WITHIN GROUP parses natively since Spark 4's listagg —
    // the agg argument, the WITHIN GROUP sort column and the grouping
    // column all survive as references
    val listAgg = QueryIntrospector.parse(spark,
      "SELECT listagg(o_clerk, ',') WITHIN GROUP (ORDER BY o_orderdate) " +
        "FROM orders WHERE o_custkey > 5 GROUP BY o_orderstatus").get
    assert(listAgg.tables == Seq("orders"))
    assert(listAgg.whereColumns == Map("o_custkey" -> 1))
    assert(Seq("o_clerk", "o_orderdate", "o_orderstatus").forall(listAgg.allColumns.contains),
      listAgg.allColumns.toString)

    // the documented still-unsupported tier degrades to None (the
    // reference's sqlglot warn-and-skip failure mode), never garbage refs
    assert(QueryIntrospector.parse(spark,
      "SELECT id FROM t WHERE CAST(payload AS ROW(a INTEGER)) IS NOT NULL").isEmpty)

    // MATCH_RECOGNIZE (r11 #1): sqlglot extracts the FROM-clause table from
    // pattern-matching queries; the shim strips the clause (balanced-paren,
    // it names no tables) so the refs survive — and the pattern variables /
    // DEFINE idents (A, B, v) must not leak as columns
    val mr = QueryIntrospector.parse(spark,
      "SELECT * FROM t MATCH_RECOGNIZE (PARTITION BY id ORDER BY ts " +
        "MEASURES A.ts AS a_ts PATTERN (A B) DEFINE B AS B.v > A.v) " +
        "AS m WHERE id > 3").get
    assert(mr.tables == Seq("t"), mr.tables.toString)
    assert(mr.whereColumns.keySet == Set("id"), mr.whereColumns.toString)
    assert(!mr.allColumns.exists(Set("a", "b", "v", "a_ts")),
      s"pattern idents leaked: ${mr.allColumns}")

    // nested parens inside the clause (quantified patterns, function args)
    // survive the balanced scan; parens inside STRING literals are masked
    // and cannot break the balance
    val mr2 = QueryIntrospector.parse(spark,
      "SELECT user_id FROM events MATCH_RECOGNIZE (ORDER BY ts " +
        "MEASURES max(coalesce(value, 0.0)) AS peak " +
        "PATTERN ((A|B)+ C{2,}) DEFINE C AS label = ') (') " +
        "WHERE user_id < 7").get
    assert(mr2.tables == Seq("events"), mr2.tables.toString)
    assert(mr2.whereColumns.keySet == Set("user_id"), mr2.whereColumns.toString)

    // an UNBALANCED clause is left alone and degrades like any parse failure
    assert(QueryIntrospector.parse(spark,
      "SELECT * FROM t MATCH_RECOGNIZE (PATTERN (A B").isEmpty)

    // an identifier merely ENDING in match_recognize is NOT the clause —
    // the call (and its argument column) must survive untouched
    val fn = QueryIntrospector.parse(spark,
      "SELECT my_match_recognize(props) FROM events WHERE user_id < 7").get
    assert(fn.tables == Seq("events") && fn.allColumns.contains("props"),
      s"${fn.tables} / ${fn.allColumns}")

    // and genuine garbage still degrades to None through both dialects
    assert(QueryIntrospector.parse(spark, "SELECT ARRAY[1 FROM nope").isEmpty)
  }

  test("workloadTexts heavy-hitter selector: frequency order, text tiebreak, cap, null drop") {
    // THE shared selector (every driver-side text collect funnels through
    // it): most-frequent first, ties broken by text ascending, nulls
    // dropped, cap truncates (with a warning, not an error)
    import spark.implicits._
    val log = Seq(
      Some("b"), Some("b"), Some("b"),
      Some("c"), Some("c"),
      Some("a"), Some("a"),        // ties c: broken by text → a before c
      Some("d"),
      None, None)
      .toDF("query")
    val all = QueryIntrospector.workloadTexts(log)
    assert(all == Seq("b", "a", "c", "d"))
    val capped = QueryIntrospector.workloadTexts(log, cap = 2)
    assert(capped == Seq("b", "a"))
  }
}
