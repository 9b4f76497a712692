package graft

import graft.operators.{AsOfJoin, ConnectedComponents, SkewJoin}
import org.apache.spark.sql.functions._

/** AsOfJoin / SkewJoin operator tests: semantics vs brute force, and
  * salted-join equivalence to the plain join.
  */
class OperatorsSpec extends SparkFunSuite {

  test("leftAsOf picks the latest right row at-or-before, per key") {
    import spark.implicits._
    val quotes = Seq( // (key, ts, price)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "qts", "price")
    val trades = Seq( // (key, ts, qty)
      ("A", 9L, 100L), // before any quote → null
      ("A", 10L, 200L), // exactly at quote 10 → inclusive match 1.0
      ("A", 25L, 300L), // between 20 and 30 → 2.0
      ("A", 99L, 400L), // after all → 3.0
      ("B", 20L, 500L), // → 9.0
      ("C", 5L, 600L)) // unknown key → null
      .toDF("sym", "tts", "qty")
    val got = AsOfJoin.leftAsOf(trades, quotes, "tts", "qts", "sym", "sym",
      Seq("price"))
      .select("sym", "tts", "qty", "price")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)))).toSet
    assert(got == Set(
      ("A", 9L, 100L, None),
      ("A", 10L, 200L, Some(1.0)),
      ("A", 25L, 300L, Some(2.0)),
      ("A", 99L, 400L, Some(3.0)),
      ("B", 20L, 500L, Some(9.0)),
      ("C", 5L, 600L, None)))
  }

  test("leftAsOf matches the brute-force definition on real data") {
    // events carry ns ts → go through Catalog.t's conversion
    val events = graft.queries.Catalog.t(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts")).limit(200)
    val ords = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_order"))
    val fast = AsOfJoin.leftAsOf(events, ords, "ts", "o_orderdate",
      "user_id", "o_custkey", Seq("last_order"))
      .select("event_id", "last_order")
    // brute force: theta join + max per event
    val brute = events.join(ords,
      events("user_id") === ords("o_custkey") &&
        events("ts") >= ords("o_orderdate"), "left")
      .groupBy("event_id")
      .agg(max_by(col("last_order"), struct(col("o_orderdate"),
        col("last_order"))).as("last_order"))
    val f = fast.collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val b = brute.collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(f == b)
  }

  test("intervalJoin matches the pure range-predicate join") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val points = Seq((1, ts(5)), (1, ts(65)), (1, ts(200)), (2, ts(10)))
      .toDF("k", "pts")
    val intervals = Seq(
      (1, ts(0), ts(60), "i1"), // contains 5
      (1, ts(60), ts(120), "i2"), // contains 65
      (2, ts(0), ts(30), "i3"), // contains 10
      (1, ts(300), ts(400), "i4")) // contains nothing
      .toDF("ik", "istart", "iend", "iname")
    val got = graft.operators.AsOfJoin.intervalJoin(points, intervals,
      "pts", "istart", "iend", "k", "ik", bucketMs = 15 * 60000L)
      .select("k", "pts", "iname")
      .collect().map(r => (r.getInt(0), r.getTimestamp(1), r.getString(2)))
      .toSet
    val brute = points.join(intervals,
      col("k") === col("ik") && col("pts") >= col("istart") &&
        col("pts") < col("iend"))
      .select("k", "pts", "iname")
      .collect().map(r => (r.getInt(0), r.getTimestamp(1), r.getString(2)))
      .toSet
    assert(got == brute && got.map(_._3) == Set("i1", "i2", "i3"))
  }

  test("connected components: chains, separate clusters, pair dedup") {
    import spark.implicits._
    // component A: a 6-node chain (forces multiple propagation rounds);
    // component B: a triangle with duplicate/reversed edges;
    // component C: a single pair
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L),
      (20L, 21L), (21L, 22L), (22L, 20L), (20L, 21L), (21L, 20L),
      (30L, 31L))
      .toDF("a", "b")
    val got = ConnectedComponents.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 15L).forall(got(_) == 10L))
    assert((20L to 22L).forall(got(_) == 20L))
    assert(got(30L) == 30L && got(31L) == 30L)
    assert(got.size == 11)
  }

  test("connected components: non-convergence throws, never returns partial labels") {
    import spark.implicits._
    // a 6-node chain needs ~3 min-propagation rounds; maxIter=1 cannot
    // finish — the contract is to fail loudly, not hand back wrong
    // clusters
    val chain = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (14L, 15L)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.components(chain, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // and the same graph converges fine with headroom
    val ok = ConnectedComponents.components(chain, maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 15L).forall(ok(_) == 10L))
  }

  test("connected components: 200-node path converges within the default " +
      "round budget (pointer-jumping gives O(log diameter) rounds)") {
    import spark.implicits._
    val path = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    // diameter 199: plain min-propagation needs ~199 rounds; with the
    // per-round compression step the covered distance doubles each
    // round (~9 rounds here), so the default maxIter=25 has ample
    // headroom. This also exercises the per-round localCheckpoint.
    val res = ConnectedComponents.components(path)
    val got = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200)
    assert(got.values.forall(_ == 0L))
    // lineage is truncated: the result reads a checkpointed RDD, not a
    // 9-round nested join chain
    val lineageDepth = res.rdd.toDebugString.linesIterator.size
    assert(lineageDepth <= 10,
      s"lineage not truncated: depth $lineageDepth (an untruncated " +
        "9-round chain is dozens of lines)")
  }

  test("connected components round adds only label-sized exchanges " +
      "(edge partitioning is reused, never reshuffled)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bct = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // static plans so exchange counting is deterministic (AQE hides
      // exchanges behind query stages; broadcast would skip them)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
        .distinct().repartition(col("dst")).persist()
      val labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")).repartition(col("id")).persist()
      edges.count(); labels.count() // materialize the round inputs
      val (stepped, cand) = ConnectedComponents.propagateOnce(edges, labels)
      val round = stepped.repartition(col("id"))
      val exchanges = round.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // one per round for groupBy(src), one for the compression join's
      // label side, one for the repartition back to id — and none of
      // them edge-sized or edge-keyed: the cached edges partitioning
      // is reused every round
      assert(exchanges.size <= 3,
        s"round plan has ${exchanges.size} exchanges:\n" +
          round.queryExecution.executedPlan.toString)
      cand.unpersist(); edges.unpersist(); labels.unpersist()
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bct)
    }
  }

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    // skewed large side: 90% of rows on key 1
    val large = (1 to 1000).map(i =>
      (if (i <= 900) 1 else i % 50, s"row$i")).toDF("k", "v")
    val small = (0 to 49).map(i => (i, s"dim$i")).toDF("k", "name")
    val plain = large.join(small, "k")
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", saltBuckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.select("k", "v", "name").except(
      plain.select("k", "v", "name")).isEmpty)
    assert(plain.select("k", "v", "name").except(
      salted.select("k", "v", "name")).isEmpty)
  }

  test("PageRank: symmetric ring is rank-uniform, star concentrates on hub") {
    import spark.implicits._
    // undirected 6-ring: perfect symmetry → every node's rank identical
    val ring = (0 until 6).flatMap(i => Seq(
      (i.toLong, ((i + 1) % 6).toLong),
      (((i + 1) % 6).toLong, i.toLong))).toDF("src", "dst")
    val rr = graft.operators.PageRank.run(ring).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rr.length == 6)
    assert(rr.map(_._2).toSet.size == 1)
    // star (hub 0 ↔ leaves 1-5): hub rank strictly dominates, leaves equal
    val star = (1 to 5).flatMap(i =>
      Seq((0L, i.toLong), (i.toLong, 0L))).toDF("src", "dst")
    val sr = graft.operators.PageRank.run(star).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sr.size == 6)
    val leaves = (1 to 5).map(i => sr(i.toLong))
    assert(leaves.toSet.size == 1)
    assert(sr(0L) > leaves.head * 3)
  }

  test("PageRank: returned rank state is checkpoint-truncated " +
    "(no join lineage — the guard against per-round plan nesting)") {
    import spark.implicits._
    val edges = (0 until 6).flatMap(i => Seq(
      (i.toLong, ((i + 1) % 6).toLong),
      (((i + 1) % 6).toLong, i.toLong))).toDF("src", "dst")
    val r = graft.operators.PageRank.run(edges, 3)
    // after localCheckpoint the plan is a scan of checkpointed blocks;
    // a Join/Aggregate here means lineage leaked and AQE would re-plan
    // the whole iteration tower on every downstream stage (measured
    // 1.8 s -> 50-110 s at sf0.1)
    val plan = r.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"rank lineage not truncated:\n$plan")
    assert(!plan.contains("Aggregate"), "rank lineage not truncated")
  }

  test("PageRank: mass conserved up to floor-division truncation, " +
    "deterministic across runs") {
    import spark.implicits._
    // irregular graph: ring + chords → mixed degrees
    val chords = Seq((0L, 3L), (3L, 0L), (1L, 4L), (4L, 1L), (0L, 2L),
      (2L, 0L))
    val ring = (0 until 8).flatMap(i => Seq(
      (i.toLong, ((i + 1) % 8).toLong),
      (((i + 1) % 8).toLong, i.toLong)))
    val edges = (ring ++ chords).toDF("src", "dst")
    val scale = 1000000000000L
    val r1 = graft.operators.PageRank.run(edges, 5, scale).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // each round truncates < 100 per node (div 100) + 1 per in-edge
    // (div outdeg): total loss after 5 rounds is ppm-scale vs 1e12
    val total = r1.map(_._2).sum
    assert(total <= scale)
    assert(total > scale - scale / 1000)
    val r2 = graft.operators.PageRank.run(edges, 5, scale).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(r1 == r2)
  }
}
