package graft.cdc

import graft.SparkTestBase

class LwwSpec extends SparkTestBase {
  import java.sql.Timestamp

  private def ev(lsn: Long, op: String, repo: String = "r", path: String = "p",
      commit: String = "c", content: String = "x"): ChangeEvent =
    ChangeEvent(lsn, new Timestamp(1700000000000L + lsn), op, 1, repo, path,
      commit, "scala", if (op == "D") null else content, null, null)

  test("aggregator picks max lsn; op priority breaks ties (D > U > I)") {
    val a = ev(5, "U", content = "old")
    val b = ev(9, "I", content = "new")
    assert(LwwAggregator.merge(a, b).content == "new")
    assert(LwwAggregator.merge(b, a).content == "new")
    val d = ev(9, "D")
    assert(LwwAggregator.merge(b, d).op == "D")
    assert(LwwAggregator.merge(d, b).op == "D")
    assert(LwwAggregator.merge(null, b) == b)
    assert(LwwAggregator.merge(b, null) == b)
  }

  test("aggregator is associative and commutative (monoid law, replay determinism)") {
    // exhaustive over the domain that matters: lsn 0..3 × ops I/U/D
    val domain = for (lsn <- 0L to 3L; op <- Seq("I", "U", "D"))
      yield ev(lsn, op, content = s"c$lsn$op")
    for (a <- domain; b <- domain; c <- domain) {
      val left = LwwAggregator.merge(LwwAggregator.merge(a, b), c)
      val right = LwwAggregator.merge(a, LwwAggregator.merge(b, c))
      assert((left.lsn, left.op) == ((right.lsn, right.op)))
      val ab = LwwAggregator.merge(a, b); val ba = LwwAggregator.merge(b, a)
      assert((ab.lsn, ab.op) == ((ba.lsn, ba.op)))
    }
  }

  test("distributed lww == window spec == salted lww, on a skewed log") {
    import spark.implicits._
    val cfg = GenConfig(numEvents = 5000, numRepos = 20, pathsPerRepo = 5,
      commitsPerFile = 3)
    val log = ChangeLogGen.generate(spark, cfg).cache()

    val agg = Dedup.lww(log).collect()
      .map(e => (e.repo, e.path, e.commit) -> (e.lsn, e.op)).toMap
    val win = Dedup.lwwWindowSpec(log.toDF(), ChangeEvent.keyCols, "lsn", "op")
      .collect().map(r => (r.getAs[String]("repo"), r.getAs[String]("path"),
        r.getAs[String]("commit")) -> (r.getAs[Long]("lsn"), r.getAs[String]("op"))).toMap
    val salted = Dedup.lwwSalted(log, 8).collect()
      .map(e => (e.repo, e.path, e.commit) -> (e.lsn, e.op)).toMap
    val saltedDf = Dedup.lwwDf(CdcPipeline.envelopeDf(log), ChangeEvent.keyCols, 8)
      .collect().map(r => (r.getAs[String]("repo"), r.getAs[String]("path"),
        r.getAs[String]("commit")) -> (r.getAs[Long]("lsn"), r.getAs[String]("op"))).toMap

    assert(agg == win)
    assert(agg == salted)
    assert(agg == saltedDf)
    log.unpersist()
  }

  test("generator ground truth matches distributed dedup (independent code path)") {
    val cfg = GenConfig(numEvents = 3000, numRepos = 10, pathsPerRepo = 4,
      commitsPerFile = 2)
    val expected = ChangeLogGen.expectedFinalState(cfg)
    val log = ChangeLogGen.generate(spark, cfg)
    val got = Dedup.lww(log).filter(_.op != "D").collect()
      .map(e => (e.repo, e.path, e.commit) -> e.lsn).toMap
    assert(got == expected.map { case (k, e) => k -> e.lsn })
  }
}
