package graft.sql

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Row-group statistics skipping inside data files: residual scan filters
  * translate per file (stored names/types via column IDs) into parquet
  * FilterPredicates, so a range query over a `compact(sortBy)`-clustered
  * file decodes only the row groups whose stats overlap. */
class SqlRowGroupSkipSpec extends SparkTestBase {

  private def cs(out: String, outT: DataType, stored: String, storedT: DataType) =
    ColSpec(out, outT.json, stored, storedT.json)

  test("translation: stored-name remap, widened skip, partial And kept, partial Or dropped") {
    val cols = Seq(
      cs("lang2", StringType, "lang", StringType), // renamed since file was written
      cs("size", LongType, "size", IntegerType), // widened: value spaces differ
      cs("n", LongType, "n", LongType))
    val renamed = GraftParquetFilters.build(Seq(EqualTo("lang2", "scala")), cols)
    assert(renamed.isDefined && renamed.get.toString.contains("lang") &&
      !renamed.get.toString.contains("lang2"), s"$renamed")
    assert(GraftParquetFilters.build(Seq(GreaterThan("size", 5L)), cols).isEmpty,
      "widened column must not be stats-compared against the stored type")
    val and = GraftParquetFilters.build(
      Seq(And(EqualTo("n", 1L), GreaterThan("size", 5L))), cols)
    assert(and.isDefined && and.get.toString.contains("n"), s"$and")
    assert(GraftParquetFilters.build(
      Seq(Or(EqualTo("n", 1L), GreaterThan("size", 5L))), cols).isEmpty,
      "an Or with an untranslatable side is unsound and must drop entirely")
    val in = GraftParquetFilters.build(Seq(In("n", Array(1L, 2L))), cols)
    assert(in.isDefined && in.get.toString.startsWith("or("), s"$in")
    assert(GraftParquetFilters.build(Seq(IsNotNull("lang2")), cols)
      .exists(_.toString.toLowerCase.contains("noteq(lang, null)")))
    assert(GraftParquetFilters.build(Seq(EqualTo("missing", 1L)), cols).isEmpty)
    // Not over a PARTIAL And would negate a superset into a subset — drop it;
    // Not over an exactly-translated child stays sound
    assert(GraftParquetFilters.build(
      Seq(Not(And(EqualTo("n", 1L), GreaterThan("size", 5L)))), cols).isEmpty)
    assert(GraftParquetFilters.build(Seq(Not(EqualTo("n", 1L))), cols).isDefined)
  }

  test("a narrow range reads only its row groups — through BOTH the row and vectorized readers") {
    import spark.implicits._
    val t = LakeTable.createOrReplace(spark, tmpDir("rgskip"), StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", LongType, nullable = true),
      StructField("pad", StringType, nullable = true))), Seq("k"), numBuckets = 1)
    def part(lo: Int, hi: Int) =
      (lo until hi).map(i => (s"k$i", i.toLong, "x" * 64)).toDF("k", "v", "pad")
    t.append(part(0, 2000))
    t.append(part(2000, 4000)) // second small file so compact has work
    // tiny row groups + sort by v → ONE file whose groups cover disjoint
    // ascending v ranges (the layout compact(sortBy) exists to produce)
    val hc = spark.sparkContext.hadoopConfiguration
    val (ob, op) = (hc.get("parquet.block.size"), hc.get("parquet.page.size"))
    hc.setInt("parquet.block.size", 4096); hc.setInt("parquet.page.size", 1024)
    try assert(t.compact(minFiles = 2, sortBy = Seq("v")) > 0)
    finally {
      if (ob != null) hc.set("parquet.block.size", ob) else hc.unset("parquet.block.size")
      if (op != null) hc.set("parquet.page.size", op) else hc.unset("parquet.page.size")
    }
    val snap = t.meta.currentSnapshot.get
    assert(snap.files.size == 1)
    val path = s"${t.root}/${snap.files.head.path}"
    val cols = Array(cs("k", StringType, "k", StringType),
      cs("v", LongType, "v", LongType))
    val pred = GraftParquetFilters.build(
      Seq(GreaterThanOrEqual("v", 100L), LessThanOrEqual("v", 120L)), cols.toSeq)
    assert(pred.isDefined)

    def rowRead(p: Option[org.apache.parquet.filter2.predicate.FilterPredicate]) = {
      val r = new GraftPartitionReader(GraftInputPartition(path, cols, pred = p),
        new org.apache.hadoop.conf.Configuration())
      var n = 0L; while (r.next()) n += 1; r.close(); n
    }
    def colRead(p: Option[org.apache.parquet.filter2.predicate.FilterPredicate]) = {
      val r = new GraftColumnarReader(conf = new org.apache.hadoop.conf.Configuration(), p = 
        GraftInputPartition(path, cols, columnar = true, pred = p))
      var n = 0L; while (r.next()) n += r.get().numRows(); r.close(); n
    }
    assert(rowRead(None) == 4000L && colRead(None) == 4000L)
    // row path: group skip + record-level filter → exactly the 21 matches
    assert(rowRead(pred) == 21L)
    // vectorized path: group skip only (no record filter) — materializes the
    // few overlapping groups, far less than the file, never losing a match
    val cv = colRead(pred)
    assert(cv >= 21L && cv < 1000L,
      s"expected only the overlapping row groups, read $cv of 4000 rows")
    // every group eliminated: both readers must come up cleanly empty
    val none = GraftParquetFilters.build(Seq(GreaterThan("v", 999999L)), cols.toSeq)
    assert(rowRead(none) == 0L && colRead(none) == 0L)
  }

  test("key-column bloom filters skip row groups where min/max stats cannot (hash-distributed keys)") {
    import spark.implicits._
    val t = LakeTable.createOrReplace(spark, tmpDir("bloom"), StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("pad", StringType, nullable = true))), Seq("k"), numBuckets = 1)
    // scrambled keys: every row group's [min,max] spans ~the whole keyspace,
    // so stats pruning is useless for equality — only the bloom can skip
    def key(i: Int) = f"k${(i * 2654435761L) % 1000000}%07d"
    val hc = spark.sparkContext.hadoopConfiguration
    val (ob, op) = (hc.get("parquet.block.size"), hc.get("parquet.page.size"))
    hc.setInt("parquet.block.size", 4096); hc.setInt("parquet.page.size", 1024)
    try t.append((0 until 4000).map(i => (key(i), "x" * 64)).toDF("k", "pad").coalesce(1))
    finally {
      if (ob != null) hc.set("parquet.block.size", ob) else hc.unset("parquet.block.size")
      if (op != null) hc.set("parquet.page.size", op) else hc.unset("parquet.page.size")
    }
    val snap = t.meta.currentSnapshot.get
    val path = s"${t.root}/${snap.files.head.path}"
    // the footer carries a bloom for k
    val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), new org.apache.hadoop.conf.Configuration()))
    val blocks = try {
      val bs = fr.getFooter.getBlocks
      assert(bs.size() > 3, s"expected many row groups, got ${bs.size()}")
      bs.asScala.foreach { b =>
        val kCol = b.getColumns.asScala.find(_.getPath.toDotString == "k").get
        assert(kCol.getBloomFilterOffset > 0, "no bloom filter written for key column")
      }
      bs.size()
    } finally fr.close()
    val cols = Array(cs("k", StringType, "k", StringType))
    def colRead(p: Option[org.apache.parquet.filter2.predicate.FilterPredicate]) = {
      val r = new GraftColumnarReader(conf = new org.apache.hadoop.conf.Configuration(), p = 
        GraftInputPartition(path, cols, columnar = true, pred = p))
      var n = 0L; while (r.next()) n += r.get().numRows(); r.close(); n
    }
    assert(colRead(None) == 4000L)
    // present key: only the bloom-positive group(s) are decoded
    val hit = colRead(GraftParquetFilters.build(Seq(EqualTo("k", key(3777))), cols.toSeq))
    assert(hit >= 1L && hit < 4000L / 2,
      s"bloom should skip most of the $blocks groups, read $hit rows")
    // absent key inside every group's [min,max]: bloom proves absence
    assert(colRead(GraftParquetFilters.build(
      Seq(EqualTo("k", "k0500001")), cols.toSeq)) == 0L)
  }

  test("e2e SQL: range + equality predicates stay exact across a column rename and tombstones") {
    val wh = tmpDir("rgwh")
    spark.conf.set("spark.sql.catalog.g21", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g21.warehouse", wh)
    spark.sql("CREATE NAMESPACE g21.ns")
    spark.sql("CREATE TABLE g21.ns.t (k STRING, v BIGINT, lang STRING) " +
      "TBLPROPERTIES ('keys'='k','buckets'='2')")
    spark.sql("INSERT INTO g21.ns.t SELECT concat('k', id), id, " +
      "CASE WHEN id % 3 = 0 THEN 'py' ELSE 'scala' END FROM range(0, 300)")
    spark.sql("DELETE FROM g21.ns.t WHERE v >= 290") // tombstones → row reader
    spark.sql("ALTER TABLE g21.ns.t RENAME COLUMN v TO val") // files keep 'v'
    val got = spark.sql(
      "SELECT val FROM g21.ns.t WHERE val BETWEEN 100 AND 110 AND lang = 'scala'")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (100L to 110L).filter(_ % 3 != 0))
    assert(spark.sql("SELECT count(*) AS c FROM g21.ns.t WHERE val >= 280")
      .head().getLong(0) == 10L) // 280..289 live, 290+ deleted
  }
}
