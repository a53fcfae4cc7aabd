package graft

import graft.catalog.TableRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-8 — the remaining classic TPC-H join/subquery shapes, adapted to
  * the fixture's column surface (no partsupp/commitdate/shipmode columns;
  * each key keeps its namesake's PLAN shape — that is what's being
  * exercised). Money discipline as everywhere: sum(cast decimal) then one
  * cast to double, so accumulation order cannot flip low bits.
  */
object Queries8 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableRegistry.table(s, dir, name)

  /** revenue = Σ extendedprice·(1−discount), decimal-exact. */
  private val rev =
    sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
  private val revSql = "SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))"

  val specs: Seq[QSpec] = Seq(

    QSpec("q7_volume",
      // Q7 shape: nation-to-nation trade volume through the full
      // supplier→lineitem→orders→customer chain with BOTH nation dims
      // joined (broadcast), grouped by the directed nation pair and year.
      // opt-r15 (guide §2.3 — filter before the big shuffle): the former
      // chain joined the FULL supplier and customer tables through
      // lineitem⋈orders and applied the two-nation predicate only at the
      // end, so ~all lineitem rows crossed both fact-sized joins to be
      // discarded (2 of N nations survive). The disjunction only ever
      // admits supp_nation ∈ {N0,N1} AND cust_nation ∈ {N0,N1}, so
      // prefiltering each dimension side to that superset is
      // result-identical (the exact OR is still applied before the
      // rollup; oracle untouched). Lineitem now shrinks to the two
      // nations' suppliers AT THE SCAN-SIDE join, before the o_orderkey
      // shuffle; orders shrinks via the filtered-customer join before
      // meeting lineitem.
      (s, dir) => {
        val n1 = t(s, dir, "nation").select(col("n_nationkey").as("s_nk"),
          col("n_name").as("supp_nation"))
        val n2 = t(s, dir, "nation").select(col("n_nationkey").as("c_nk"),
          col("n_name").as("cust_nation"))
        val supp2 = t(s, dir, "supplier")
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .where(col("supp_nation").isin("NATION_0", "NATION_1"))
          .select(col("s_suppkey"), col("supp_nation"))
        val cust2 = t(s, dir, "customer")
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .where(col("cust_nation").isin("NATION_0", "NATION_1"))
          .select(col("c_custkey"), col("cust_nation"))
        t(s, dir, "lineitem")
          .join(supp2, col("l_suppkey") === col("s_suppkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(cust2, col("o_custkey") === col("c_custkey"))
          .where((col("supp_nation") === "NATION_0" && col("cust_nation") === "NATION_1") ||
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_0"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(round(rev.cast("double"), 4).as("volume"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(
        s"""SELECT supp_nation, cust_nation, l_year,
           |  ROUND(CAST($revSql AS DOUBLE), 4) AS volume
           |FROM (
           |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |    CAST(year(l_shipdate) AS INT) AS l_year,
           |    l_extendedprice, l_discount
           |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           |    JOIN orders ON l_orderkey = o_orderkey
           |    JOIN customer ON o_custkey = c_custkey
           |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |  WHERE (n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
           |     OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0')) v
           |GROUP BY supp_nation, cust_nation, l_year
           |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    QSpec("q8_mktshare",
      // Q8 shape: market share of one supplier nation inside one customer
      // region per year — conditional share of a revenue aggregate. The
      // share is ONE division of two decimal-exact sums per group.
      // opt-r15 (guide §2.3 — filter before the big shuffle): r_name =
      // 'ASIA' constrains only the customer→nation→region chain, yet the
      // former plan applied it after supplier⋈lineitem⋈orders⋈customer —
      // the full fact crossed every join first. Resolve the ASIA customer
      // set FIRST (nation/region broadcast), shrink orders through it
      // BEFORE the o_orderkey join, and lineitem then meets an
      // already-region-filtered orders side. All joins inner, filter
      // dimension-only → result-identical; oracle untouched.
      (s, dir) => {
        val nS = t(s, dir, "nation").select(col("n_nationkey").as("s_nk"),
          col("n_name").as("supp_nation"))
        val nC = t(s, dir, "nation").select(col("n_nationkey").as("c_nk"),
          col("n_regionkey").as("c_rk"))
        val asiaCust = t(s, dir, "customer")
          .join(broadcast(nC), col("c_nationkey") === col("c_nk"))
          .join(broadcast(t(s, dir, "region")), col("c_rk") === col("r_regionkey"))
          .where(col("r_name") === "ASIA")
          .select(col("c_custkey"))
        val joined = t(s, dir, "lineitem")
          .join(t(s, dir, "orders").join(asiaCust,
              col("o_custkey") === col("c_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nS), col("s_nationkey") === col("s_nk"))
        joined
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            // both sums are exact decimal(·,4) rationals — integer-exact
            // rounding via the x10000 unscale (ExactMath r8)
            graft.ext.ExactMath.ratioRounded(
              sum(when(col("supp_nation") === "NATION_2",
                (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
                .otherwise(lit(0).cast("decimal(18,4)"))) * lit(10000),
              rev * lit(10000), 6).as("mkt_share"))
          .orderBy("o_year")
      },
      Some(
        s"""SELECT o_year,
           |  (CAST(((2000000::HUGEINT * CAST(SUM(CASE WHEN supp_nation = 'NATION_2'
           |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
           |      ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS HUGEINT)
           |    + CAST($revSql * 10000 AS HUGEINT))
           |    // (2::HUGEINT * CAST($revSql * 10000 AS HUGEINT))) AS DOUBLE) / 1000000) AS mkt_share
           |FROM (
           |  SELECT n1.n_name AS supp_nation,
           |    CAST(year(o_orderdate) AS INT) AS o_year,
           |    l_extendedprice, l_discount
           |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           |    JOIN orders ON l_orderkey = o_orderkey
           |    JOIN customer ON o_custkey = c_custkey
           |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |    JOIN region ON n2.n_regionkey = r_regionkey
           |  WHERE r_name = 'ASIA') v
           |GROUP BY o_year ORDER BY o_year""".stripMargin)),

    QSpec("q12_priority_late",
      // Q12 shape: two-way conditional counts after the orders⋈lineitem
      // join — here "late" = shipped more than 60 days after the order
      // date (the fixture has no shipmode/commitdate; the conditional-
      // count-after-join plan is what Q12 exercises).
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
            .otherwise(0L)).as("late_count"),
          sum(when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
            .otherwise(0L)).as("ontime_count"))
        .orderBy("o_orderpriority"),
      Some(
        """SELECT o_orderpriority,
          |  CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
          |    THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
          |  CAST(SUM(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 60 DAY
          |    THEN 1 ELSE 0 END) AS BIGINT) AS ontime_count
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QSpec("q14_promo",
      // Q14 shape: promo revenue share — conditional-sum ratio over the
      // lineitem⋈part join restricted to one ship year.
      (s, dir) => t(s, dir, "lineitem")
        .where(year(col("l_shipdate")) === 1997)
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(graft.ext.ExactMath.ratioRounded(
          sum(when(col("p_type") === "PROMO",
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
            .otherwise(lit(0).cast("decimal(18,4)"))) * lit(1000000),
          rev * lit(10000), 6).as("promo_revenue_pct")),
      Some(
        s"""SELECT (CAST(((2000000::HUGEINT * CAST(SUM(CASE WHEN p_type = 'PROMO'
           |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
           |      ELSE CAST(0 AS DECIMAL(18,4)) END) * 1000000 AS HUGEINT)
           |    + CAST($revSql * 10000 AS HUGEINT))
           |    // (2::HUGEINT * CAST($revSql * 10000 AS HUGEINT))) AS DOUBLE) / 1000000) AS promo_revenue_pct
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE year(l_shipdate) = 1997""".stripMargin)),

    QSpec("q17_small_qty",
      // Q17 shape: per-part average-quantity correlated aggregate — never
      // a correlated re-scan per row.
      //
      // opt-r15 (guide §2.4 — two operations keyed the same way share one
      // exchange): the former groupBy-then-join-back scanned lineitem
      // TWICE and shuffled twice (the narrow partkey aggregate, then the
      // full fact for the join — the aggregate is fact-derived, so at
      // scale that join is a second fact-sized shuffle). The per-part
      // average is a window over l_partkey: ONE scan, ONE shuffle, and
      // the avg expression is arithmetic-identical (same decimal(18,2)
      // sum / count per part, divided as double), so every row lands the
      // same side of the 0.5·avg predicate — oracle (which keeps the
      // join-back form) hash-identical at all SFs. partkey is
      // high-cardinality/unskewed, so no hot-key window task (the r12
      // window audit criterion).
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
        li.withColumn("avg_qty",
            sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double") /
              count(lit(1)).over(w))
          .where(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double"), 2).as("small_qty_revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some(
        """WITH a AS (SELECT l_partkey AS ap_partkey,
          |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
          |  FROM lineitem GROUP BY l_partkey)
          |SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
          |    AS small_qty_revenue,
          |  CAST(COUNT(*) AS BIGINT) AS n_lines
          |FROM lineitem JOIN a ON l_partkey = ap_partkey
          |WHERE l_quantity < 0.5 * avg_qty""".stripMargin)),

    QSpec("q19_disjunctive",
      // Q19 shape: OR-of-ANDs across both join sides — the predicate a
      // planner must NOT turn into a cross product; Spark pushes the
      // common l_partkey = p_partkey equi-key and evaluates the
      // disjunction as a post-join filter.
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(5, 25) &&
            col("l_quantity").between(5, 25)) ||
          (col("p_brand") === "Brand#20" && col("p_size").between(10, 50) &&
            col("l_quantity").between(10, 35)))
        .agg(round(rev.cast("double"), 4).as("revenue"),
          count(lit(1)).as("n_lines")),
      Some(
        s"""SELECT ROUND(CAST($revSql AS DOUBLE), 4) AS revenue,
           |  CAST(COUNT(*) AS BIGINT) AS n_lines
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           |    AND l_quantity BETWEEN 1 AND 15)
           |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 5 AND 25
           |    AND l_quantity BETWEEN 5 AND 25)
           |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 50
           |    AND l_quantity BETWEEN 10 AND 35)""".stripMargin)),

    QSpec("q21_waiting",
      // Q21 shape: the double-correlated EXISTS / NOT EXISTS — suppliers
      // who were the ONLY supplier with returned items in a multi-supplier
      // order. Both engines evaluate it as per-order distinct counts
      // joined back (the decorrelated plan Q21 forces), so no correlated
      // re-scan per row anywhere.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        // two distinct aggregates over one group would plan through an
        // Expand (every input row replicated once per distinct clause —
        // 2-3× the shuffle bytes at 100 TB); aggregating the distinct
        // (order, supplier) PAIRS first then counting them needs one
        // un-replicated shuffle and map-side combine at both stages.
        // Equivalent because countDistinct skips NULL suppkeys and the
        // pair form filters them explicitly.
        //
        // r14: the qualifying condition (exactly ONE returning supplier in
        // a ≥2-supplier order) means the pair frame already NAMES that
        // supplier — max(suppkey WHERE ret) over the order is the unique
        // returner — so the former second lineitem scan + fact-sized join
        // back (the biggest shuffle in the plan at 10× rows) collapses to
        // an orders-sized projection; numwait = plain count (each
        // qualifying order contributes its one returner exactly once —
        // the countDistinct is implied by construction).
        val waiting = li.where(col("l_suppkey").isNotNull)
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("ret"))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_supp"), sum("ret").cast("long").as("n_supp_ret"),
            max(when(col("ret") === 1, col("l_suppkey"))).as("ret_supp"))
          .where(col("n_supp") >= 2 && col("n_supp_ret") === 1)
        waiting
          .join(t(s, dir, "supplier"), col("ret_supp") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), asc("s_name"))
      },
      Some(
        """WITH po AS (SELECT l_orderkey AS po_orderkey,
          |    COUNT(DISTINCT l_suppkey) AS n_supp,
          |    COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_supp_ret
          |  FROM lineitem GROUP BY l_orderkey)
          |SELECT s_name, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS numwait
          |FROM lineitem JOIN po ON l_orderkey = po_orderkey
          |  JOIN supplier ON l_suppkey = s_suppkey
          |WHERE l_returnflag = 'R' AND n_supp >= 2 AND n_supp_ret = 1
          |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin)),

    QSpec("q13_custdist",
      // Q13 shape: customer-order distribution — LEFT OUTER join so
      // zero-order customers survive with c_count = 0, then a second
      // aggregation over the counts themselves. The order-side filter
      // stands in for Q13's o_comment NOT LIKE (the fixture carries no
      // comment column); what's exercised is the outer-join-then-
      // double-agg plan: count(o_orderkey) ignores the nulls the outer
      // join manufactures, and both aggregations shuffle ONCE each on
      // their own key (custkey then c_count) with map-side combine —
      // no row explosion anywhere at 100 TB.
      (s, dir) => {
        val filteredOrders = t(s, dir, "orders")
          .where(col("o_orderpriority") =!= "5-LOW")
          .select("o_orderkey", "o_custkey")
        t(s, dir, "customer")
          .join(filteredOrders, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some(
        """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
          |FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
          |      FROM customer LEFT OUTER JOIN (
          |        SELECT o_orderkey, o_custkey FROM orders
          |        WHERE o_orderpriority <> '5-LOW') o
          |      ON c_custkey = o_custkey
          |      GROUP BY c_custkey) cc
          |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    QSpec("q15_top_supplier",
      // Q15 shape: the revenue "view" (per-supplier quarter revenue) joined
      // against its own scalar MAX — the equality runs on the EXACT decimal
      // sum, never the rounded double (a rounded tie-compare could admit a
      // near-max supplier; decimal equality cannot). The 1-row max side is
      // broadcast, so the view is computed once and scanned once; rendering
      // to double happens after the join, for display only.
      (s, dir) => {
        val q = t(s, dir, "lineitem")
          .where(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1996-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(rev.as("trev"))
        val mx = q.agg(max(col("trev")).as("mxrev"))
        q.join(broadcast(mx), col("trev") === col("mxrev"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("trev").cast("double"), 4).as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some(
        s"""WITH revenue AS (
           |  SELECT l_suppkey AS supplier_no, $revSql AS trev
           |  FROM lineitem
           |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name,
           |  ROUND(CAST(trev AS DOUBLE), 4) AS total_revenue
           |FROM supplier JOIN revenue ON s_suppkey = supplier_no
           |WHERE trev = (SELECT MAX(trev) FROM revenue)
           |ORDER BY s_suppkey""".stripMargin)))
}
