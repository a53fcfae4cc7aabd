package graft

import graft.functions.{GraftFunctions, IcebergMurmur3}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-spec bucket expression: spec test vectors, codegen vs interpreted
  * agreement, range property. Test vectors from the public Iceberg table
  * spec (Appendix B): murmur3_x86_32 of long 34 = 2017239379; of UTF-8
  * "iceberg" = 1210000089. */
class FunctionsSpec extends SparkSpec {

  test("murmur3 matches the published Iceberg spec vectors") {
    assert(IcebergMurmur3.hashLong(34L) == 2017239379)
    assert(IcebergMurmur3.hashUtf8(UTF8String.fromString("iceberg")) == 1210000089)
  }

  test("iceberg_bucket is registered, codegen'd, and bounded") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(34L, 0L, -1L, Long.MaxValue, 12345L).toDF("v")
      .selectExpr("v", "iceberg_bucket(16, v) AS b")
    val rows = df.collect()
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 16))
    // vector: bucket(16, 34) = 2017239379 mod 16
    assert(rows.find(_.getLong(0) == 34L).get.getInt(1) == (2017239379 & Int.MaxValue) % 16)
  }

  test("iceberg_bucket rejects non-positive bucket counts at analysis time") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(1L).toDF("v")
    // pre-r8 these surfaced as runtime ArithmeticException (% 0) or negative
    // bucket ids mid-job; the type check now rejects them at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("iceberg_bucket(0, v)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("iceberg_bucket(-4, v)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("iceberg_bucket(cast(null as int), v)").collect()
    }
  }

  test("iceberg_bucket over strings and a real column") {
    GraftFunctions.register(spark)
    val df = graft.catalog.TableRegistry.table(spark, sfDir, "customer")
      .selectExpr("iceberg_bucket(8, c_name) AS b", "iceberg_bucket(8, c_custkey) AS bk")
    val rows = df.collect()
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 8))
    // distribution sanity: 150 customers over 8 buckets should hit most buckets
    assert(rows.map(_.getInt(1)).distinct.length >= 6)
  }

  test("VectorDotRewriteRule rewrites the HOF dot-product idiom, results unchanged") {
    import graft.functions.VectorDotRewriteRule
    if (!spark.experimental.extraOptimizations.contains(VectorDotRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VectorDotRewriteRule
    val emb = graft.catalog.TableRegistry.table(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val hof = emb.selectExpr(
      "vec_id", "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, e) -> acc + e) AS d")
    assert(hof.queryExecution.optimizedPlan.toString.contains("vectordot"),
      hof.queryExecution.optimizedPlan.toString)
    val viaRule = hof.orderBy("vec_id").collect().map(_.getDouble(1))
    val direct = emb.select(col("vec_id"),
      graft.ext.SimSearch.dot(col("v"), col("v")).as("d"))
      .orderBy("vec_id").collect().map(_.getDouble(1))
    assert(viaRule.sameElements(direct))
  }

  test("VectorDotRewriteRule preserves HOF null semantics (fold poisons to NULL)") {
    import graft.functions.VectorDotRewriteRule
    if (!spark.experimental.extraOptimizations.contains(VectorDotRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VectorDotRewriteRule
    // null element in range AND a length mismatch: the aggregate/zip_with
    // fold returns NULL for both; the rewritten plan must agree (the skip-
    // mode kernel would return a partial sum — r8 review finding). Built
    // over a real scan column: an all-literal VALUES relation gets
    // evaluated away by ConvertToLocalRelation before the rewrite can show.
    val df = graft.catalog.TableRegistry.table(spark, sfDir, "documents")
      .where(col("doc_id") < 3)
      .selectExpr("doc_id",
        "CASE WHEN doc_id = 0 THEN array(1.0D, CAST(NULL AS DOUBLE)) " +
          "ELSE array(1.0D, 2.0D) END AS a",
        "CASE WHEN doc_id = 0 THEN array(2.0D, 3.0D) " +
          "WHEN doc_id = 1 THEN array(5.0D) ELSE array(3.0D, 4.0D) END AS b")
    val hof = df.selectExpr("doc_id",
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, e) -> acc + e) AS d")
      .orderBy("doc_id")
    assert(hof.queryExecution.optimizedPlan.toString.contains("vectordot"),
      hof.queryExecution.optimizedPlan.toString)
    val rows = hof.collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    // doc 0: null element → NULL; doc 1: length mismatch (zip_with pads,
    // x*NULL poisons) → NULL; doc 2: 1*3 + 2*4 = 11
    assert(rows.toSeq == Seq(None, None, Some(11.0)), rows.mkString(","))
  }

  test("VectorDot skips null elements (SQL SUM semantics) in codegen and interpreted paths") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // interpreted path: eval over literal arrays with null elements
    val lit = (vs: Array[Any]) => Literal.create(vs, ArrayType(DoubleType, containsNull = true))
    val expr = graft.functions.VectorDot(
      lit(Array[Any](1.0, null, 3.0, 4.0)), lit(Array[Any](2.0, 5.0, null, 10.0)))
    assert(expr.eval(null) == 42.0) // 1*2 + 4*10; null positions skipped
    // codegen path through a DataFrame, checked against Spark's own
    // null-propagate-then-SUM formulation (the oracle's shape: x*NULL is
    // NULL and SUM skips NULL terms)
    val df = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE), 3.0D, 4.0D) AS a, " +
        "array(2.0D, 5.0D, CAST(NULL AS DOUBLE), 10.0D) AS b")
    val viaKernel = df.select(graft.ext.SimSearch.dot(col("a"), col("b")).as("d"))
      .collect()(0).getDouble(0)
    val viaSum = df.selectExpr(
      "aggregate(filter(zip_with(a, b, (x, y) -> x * y), p -> p IS NOT NULL), 0D, (acc, e) -> acc + e) AS d")
      .collect()(0).getDouble(0)
    assert(viaKernel == 42.0 && viaSum == 42.0, s"kernel $viaKernel sum $viaSum")
  }

  test("Int8Quantize and CenterDeflect are bit-identical to the HOF forms they replaced") {
    // the r13 kernels must reproduce the former higher-order expressions
    // EXACTLY (same IEEE double-op order) over the real fixture embeddings,
    // or the quantized/ABTT oracles would drift — checked value-for-value
    val emb = graft.catalog.TableRegistry.table(spark, sfDir, "embeddings")
      .limit(200)
      .select(col("vec_id"), graft.ext.SimSearch.asDouble(col("embedding")).as("v"))
    // quantize: HOF twin
    val qHof = {
      val ma = array_max(transform(col("v"), x => abs(x)))
      when(ma === 0d, transform(col("v"), _ => lit(0d)))
        .otherwise(transform(col("v"), x => floor(x / (ma / 127d) + 0.5d)))
    }
    val qDiff = emb.select(graft.ext.SimSearch.quantize(col("v")).as("k"), qHof.as("h"))
      .where(not(col("k") <=> col("h"))).count()
    assert(qDiff == 0L, s"$qDiff rows diverge between Int8Quantize and the HOF form")
    // centerDeflect: HOF twin against arbitrary non-trivial constants
    val mu = IndexedSeq.tabulate(64)(i => 0.01 * i - 0.3)
    val pc = IndexedSeq.tabulate(64)(i => math.sin(i + 1) / 8.0)
    val muLit = array(mu.map(lit): _*)
    val pcLit = array(pc.map(lit): _*)
    val withD = emb.withColumn("d",
      graft.ext.SimSearch.dot(col("v"), pcLit) - lit(0.123d))
    val cdKernel = {
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.column(graft.functions.CenterDeflect(
        GraftColumnBridge.expression(col("v")),
        GraftColumnBridge.expression(col("d")), mu, pc))
    }
    val cdHof = transform(col("v"), (x, i) =>
      x - element_at(muLit, i + 1) - element_at(pcLit, i + 1) * col("d"))
    val cDiff = withD.select(cdKernel.as("k"), cdHof.as("h"))
      .where(not(col("k") <=> col("h"))).count()
    assert(cDiff == 0L, s"$cDiff rows diverge between CenterDeflect and the HOF form")
  }

  test("Int8Quantize and CenterDeflect THROW on a null element instead of zero-filling") {
    // r13 advice: the HOF forms these kernels are pinned bit-equal to
    // PROPAGATE null elements; the kernels' primitive output arrays cannot,
    // so a null element must surface the contract breach loudly (the
    // TopKRows 2^53-guard discipline), never silently change values
    val df = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE), 3.0D) AS v, 0.5D AS d")
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
    val qErr = intercept[Exception] {
      df.select(graft.ext.SimSearch.quantize(col("v"))).collect()
    }
    assert(chain(qErr).exists(_.contains("int8_quantize")), chain(qErr).mkString("\n"))
    val cd = {
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.column(graft.functions.CenterDeflect(
        GraftColumnBridge.expression(col("v")),
        GraftColumnBridge.expression(col("d")),
        IndexedSeq.fill(3)(0.0), IndexedSeq.fill(3)(0.1)))
    }
    val cErr = intercept[Exception] { df.select(cd).collect() }
    assert(chain(cErr).exists(_.contains("center_deflect")), chain(cErr).mkString("\n"))
  }

  test("PqAdc is value-identical to the unrolled slice/argmin-fold form") {
    val nSub = 8; val dSub = 8; val nCodes = 4
    val emb = graft.catalog.TableRegistry.table(spark, sfDir, "embeddings")
      .limit(200)
      .select(col("vec_id"), graft.ext.SimSearch.asDouble(col("embedding")).as("v"))
    // deterministic non-trivial codebook + LUTs
    val subC = Array.tabulate(nSub, nCodes, dSub)((s, c, i) =>
      math.sin(s * 31 + c * 7 + i + 1) / 3.0)
    val qdotM = Array.tabulate(nSub, nCodes)((s, c) => (s * 1000 + c * 37).toLong)
    val c2M = Array.tabulate(nSub, nCodes)((s, c) => (s * 500 + c * 11 + 1).toLong)
    // the retired literal-unrolled argmin (r14 removed it from SimSearch —
    // the r12 scale-killer shape must not exist as a callable), kept HERE
    // as the spec's independent reference formulation of the same
    // strict-<, lowest-index fold the kernel implements
    def unrolledArgmin(v: Column, centroids: Array[(Int, Array[Double])]): Column = {
      val dists = centroids.map { case (i, c) =>
        val c2 = c.map(x => x * x).sum
        (i, graft.ext.SimSearch.dot(v,
          array(c.toIndexedSeq.map(lit): _*)) * -2.0 + lit(c2))
      }
      dists.tail.foldLeft((dists.head._2, lit(dists.head._1))) {
        case ((bestD, bestI), (i, d)) =>
          (least(bestD, d), when(d < bestD, lit(i)).otherwise(bestI))
      }._2
    }
    val withCodes = (0 until nSub).foldLeft(emb) { (df, s) =>
      val cents = (0 until nCodes).map(c => (c, subC(s)(c))).toArray
      df.withColumn(s"code$s", unrolledArgmin(
        slice(col("v"), s * dSub + 1, dSub), cents))
    }
    def lut(table: Array[Array[Long]], s: Int) =
      element_at(array(table(s).toIndexedSeq.map(lit): _*), col(s"code$s") + 1)
    val amOld = (0 until nSub).map(s => lut(qdotM, s)).reduce(_ + _)
    val rmOld = (0 until nSub).map(s => lut(c2M, s)).reduce(_ + _)
    // kernel form
    val adc = {
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.column(graft.functions.PqAdc(
        GraftColumnBridge.expression(col("v")),
        (for (s <- 0 until nSub; c <- 0 until nCodes; i <- 0 until dSub)
          yield subC(s)(c)(i)).toIndexedSeq,
        (for (s <- 0 until nSub; c <- 0 until nCodes)
          yield subC(s)(c).map(x => x * x).sum).toIndexedSeq,
        (for (s <- 0 until nSub; c <- 0 until nCodes) yield qdotM(s)(c)).toIndexedSeq,
        (for (s <- 0 until nSub; c <- 0 until nCodes) yield c2M(s)(c)).toIndexedSeq,
        nSub, dSub, nCodes))
    }
    val diff = withCodes
      .select(col("vec_id"), amOld.as("amo"), rmOld.as("rmo"), adc.as("adc"))
      .where(not(element_at(col("adc"), 1) <=> col("amo")) ||
        not(element_at(col("adc"), 2) <=> col("rmo")))
      .count()
    assert(diff == 0L, s"$diff rows diverge between PqAdc and the unrolled form")
  }

  test("interpreted and codegen paths agree") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val vals = Seq(0L, 1L, -1L, 34L, 987654321L)
    val viaDf = vals.toDF("v").selectExpr("iceberg_bucket(32, v) AS b")
      .collect().map(_.getInt(0)).toSeq
    val direct = vals.map(v => IcebergMurmur3.bucketLong(v, 32))
    assert(viaDf == direct)
  }

  test("topk_rows matches the row_number window form and is partitioning-independent") {
    import graft.functions.TopKRows.topKRows
    import org.apache.spark.sql.expressions.Window
    val base = graft.catalog.TableRegistry.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"))
    val viaWindow = base
      .withColumn("rank", row_number().over(
        Window.partitionBy("l_returnflag")
          .orderBy(desc("price"), asc("l_orderkey"), asc("l_linenumber"))))
      .where(col("rank") <= 3)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("price"), col("rank"))
      .orderBy("l_returnflag", "rank").collect().toSeq
    // 17-way repartition forces partial buffers + serialize/merge across maps
    val viaAgg = base.repartition(17)
      .groupBy("l_returnflag")
      .agg(topKRows(struct(col("price"), col("l_orderkey"), col("l_linenumber")), 3).as("top"))
      .select(col("l_returnflag"), posexplode(col("top")))
      .select(col("l_returnflag"), col("col.l_orderkey"), col("col.l_linenumber"),
        col("col.price"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy("l_returnflag", "rank").collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("heavy_hitters rejects non-positive capacity at ANALYSIS time, not executor-side") {
    import graft.functions.HeavyHitters.heavyHitters
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("k")
    for (cap <- Seq(0, -1)) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.agg(heavyHitters($"k", cap)).collect()
      }
      assert(e.getMessage.contains("capacity"), e.getMessage)
    }
  }

  test("heavy_hitters: exact above capacity headroom, MG bound under adversarial capacity") {
    import graft.functions.HeavyHitters.heavyHitters
    import spark.implicits._
    // skewed stream: key k appears 2^(8-k) times, keys 0..8
    val rows = (0 to 8).flatMap(k => Seq.fill(1 << (8 - k))(k.toLong))
    val df = spark.sparkContext.parallelize(rows, 7).toDF("k")
    val n = rows.size.toLong
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap

    // capacity ≥ |distinct| ⇒ exact counts whatever the partitioning
    val exact = df.agg(heavyHitters($"k", 64).as("hh"))
      .select(explode($"hh").as("e")).select($"e.key", $"e.cnt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact == truth)

    // adversarial capacity=4: counts under-estimate by at most n/capacity,
    // and every key with freq > n/capacity is retained
    val approx = df.agg(heavyHitters($"k", 4).as("hh"))
      .select(explode($"hh").as("e")).select($"e.key", $"e.cnt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bound = n / 4
    approx.foreach { case (k, est) =>
      assert(est <= truth(k), s"over-estimate for $k")
      assert(truth(k) - est <= bound, s"error beyond n/capacity for $k")
    }
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(approx.contains(k), s"frequent key $k evicted")
    }
  }

  test("agg_heavy_hitters key stays green when distinct keys EXCEED the sketch capacity") {
    // the r9 sf1 stress finding: the key's first version emitted raw MG
    // counts under a "capacity >= distinct => exact" premise, which broke
    // the oracle compare at 1M events / ~100k users. The reworked key hashes
    // the EXACT top-10 and band-asserts the sketch against its real
    // guarantee — this regression reproduces the exposing condition
    // (distinct = 20k >> capacity = 8192) at unit scale.
    import spark.implicits._
    val hot = (0L until 10L).flatMap(u => Seq.fill(50)(u))
    val cold = 10L until 20010L
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_cap").toString
    (hot ++ cold).zipWithIndex.map { case (u, i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i), u, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("agg_heavy_hitters")(spark, dir).collect()
    // the hashed surface is the exact top-10, regardless of sketch pressure
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (0L until 10L).map(u => (u, 50L)))
    // and the sketch honored true - est <= n/capacity on every row
    assert(out.forall(_.getBoolean(2)), out.mkString("; "))
  }

  test("EpochNanosPushdownRule: exact on the integer lattice, all ops, both orientations") {
    // the rewrite must be value-identical to the raw arithmetic for every
    // comparison op, literal divisibility class, and operand orientation —
    // including the ceil/floor edges (C = u·1000 ± 1) where an off-by-one
    // division silently widens or narrows the range
    import spark.implicits._
    val micros = Seq(0L, 999L, 1000L, 1001L, 1500L, 2000L, 123456789L)
    val df = micros.toDF("us")
      .selectExpr("us", "cast(timestamp_micros(us) as timestamp_ntz) AS ts")
    val tsNanos = "unix_micros(cast(ts as timestamp)) * 1000"
    val literals = Seq(999000L, 999999L, 1000000L, 1000001L, 1500000L,
      1999999L, 2000000L, 2000001L)
    val ops = Seq(">=", ">", "<=", "<", "=")
    def expectedNs(op: String, c: Long): Set[Long] = micros.filter { u =>
      val n = u * 1000L
      op match {
        case ">=" => n >= c; case ">" => n > c; case "<=" => n <= c
        case "<" => n < c; case "=" => n == c
      }
    }.toSet
    for (c <- literals; op <- ops) {
      val got = df.where(s"$tsNanos $op ${c}L").select("us")
        .collect().map(_.getLong(0)).toSet
      assert(got == expectedNs(op, c), s"ts_nanos $op $c: got $got")
      val mirrorOp = op match {
        case ">=" => "<="; case ">" => "<"; case "<=" => ">="
        case "<" => ">"; case "=" => "="
      }
      val gotM = df.where(s"${c}L $mirrorOp $tsNanos").select("us")
        .collect().map(_.getLong(0)).toSet
      assert(gotM == expectedNs(op, c), s"$c $mirrorOp ts_nanos: got $gotM")
    }
    // the rewrite actually fires (divisible equality included)
    val p = df.where(s"$tsNanos >= 1000000L").queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("unix_micros"), p)
    val pe = df.where(s"$tsNanos = 1000000L").queryExecution.optimizedPlan.toString
    assert(!pe.toLowerCase.contains("unix_micros"), pe)
    // non-divisible equality is left alone (a FALSE rewrite would break
    // null semantics in projection contexts), and matches nothing here
    assert(df.where(s"$tsNanos = 1000001L").count() == 0L)

    // the bare-TIMESTAMP shape (what SimplifyCasts leaves when a vintage
    // ships isAdjustedToUTC=true micros): unix_micros without any cast
    // must rewrite too — zone-independent, no UTC guard involved
    val dfTs = micros.toDF("us").selectExpr("us", "timestamp_micros(us) AS ts")
    val bare = "unix_micros(ts) * 1000"
    val gotBare = dfTs.where(s"$bare >= 1000001L").select("us")
      .collect().map(_.getLong(0)).toSet
    assert(gotBare == expectedNs(">=", 1000001L), gotBare.toString)
    val pb = dfTs.where(s"$bare >= 1000001L").queryExecution.optimizedPlan.toString
    assert(!pb.toLowerCase.contains("unix_micros"), pb)

    // null-safe equality: divisible rewrites, non-divisible folds to
    // constant false (legal for <=> — it never returns NULL)
    assert(df.where(s"$tsNanos <=> 1000000L").select("us")
      .collect().map(_.getLong(0)).toSet == Set(1000L))
    assert(df.where(s"$tsNanos <=> 1000001L").count() == 0L)
    val pns = df.where(s"$tsNanos <=> 1000001L").queryExecution.optimizedPlan.toString
    assert(!pns.toLowerCase.contains("unix_micros"), pns)

    // IN: off-lattice members drop, on-lattice members match; the list
    // keeps at least one element so NULL-input semantics survive
    val gotIn = df.where(s"$tsNanos IN (999000L, 1000001L, 123456789000L)")
      .select("us").collect().map(_.getLong(0)).toSet
    assert(gotIn == Set(999L, 123456789L), gotIn.toString)
    val pin = df.where(s"$tsNanos IN (999000L, 1000001L, 123456789000L)")
      .queryExecution.optimizedPlan.toString
    assert(!pin.toLowerCase.contains("unix_micros"), pin)
    // all-off-lattice IN is left alone (no empty-list rewrite)
    assert(df.where(s"$tsNanos IN (1L, 1001L)").count() == 0L)
  }
}
