package graft.tools

import org.apache.spark.sql.SparkSession

/** Degenerate-input sweep: evaluate EVERY SparkEntry query against an
  * EMPTY fixture (the real schemas, zero rows) and a TINY fixture (the
  * first `tinyN` rows of each sf0.001 table, so referential integrity
  * is mostly broken and most joins/groups are empty or singleton).
  *
  * Motivation: at 100 TB a query runs per-partition, per-source, and
  * per-day; an empty source, a single-document language, or a
  * one-user shard is a NORMAL input, not an error. The round-12
  * advisor found exactly this class of bug once (hillTail's
  * |users| ≤ 1 feeding k ≤ 0 into the heap aggregate's require) —
  * this sweep asserts the whole 252-query catalog is closed under it:
  * every query must PLAN and EVALUATE (count()) on both fixtures,
  * returning a defined (possibly empty) frame instead of throwing.
  *
  * Usage: runMain graft.tools.DegenSweep [srcSfDir] [outRoot]
  * Exit code = number of failing (query, fixture) pairs; each failure
  * is printed as `FAIL <fixture> <query>: <exception>`.
  */
object DegenSweep {
  val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Write `limit(n)` of each source table (n=0 → schema-only). */
  def writeFixture(spark: SparkSession, src: String, out: String, n: Int): Unit = {
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(n)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  /** One key column per table to re-sequence in the CONST fixture so
    * primary keys stay unique while every other column is constant. */
  val pkCol = Map("region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_linenumber", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  /** CONST fixture: the first row of each table replicated `reps`
    * times with a fresh 0..reps-1 primary key and every OTHER column
    * identical — the zero-variance input class (std = 0, max = min,
    * one distinct value per group with count > 1, a single-symbol
    * vocabulary, a corpus that is 100 % duplicates, all embeddings at
    * one point). At 100 TB this is a normal shard, not an error: a
    * stuck sensor, a bot replaying one document, a constant-valued
    * column in a day partition. */
  def writeConstFixture(spark: SparkSession, src: String, out: String,
      reps: Int): Unit = {
    import org.apache.spark.sql.functions.col
    tables.foreach { t =>
      val one = spark.read.parquet(s"$src/$t.parquet").limit(1)
      val keyType = one.schema(pkCol(t)).dataType
      one.crossJoin(spark.range(reps.toLong).select(col("id").as("__rep")))
        .withColumn(pkCol(t), col("__rep").cast(keyType)).drop("__rep")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  /** NULLED fixture: `n` rows per table with valid (re-sequenced)
    * primary keys and every OTHER column NULL — the null-payload
    * class. At 100 TB a shard with intact keys but missing payloads
    * (a failed enrichment join, a schema-evolved source, a tombstoned
    * ingest) is a normal input; the engine contract is the DegenSweep
    * one: plan, evaluate, return a defined frame — most rows drop
    * through SQL NULL propagation, nothing throws. */
  def writeNulledFixture(spark: SparkSession, src: String, out: String,
      n: Int): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    tables.foreach { t =>
      val base = spark.read.parquet(s"$src/$t.parquet").limit(n)
      val keyType = base.schema(pkCol(t)).dataType
      val nulled = base.schema.fields.foldLeft(
          base.withColumn(pkCol(t),
            org.apache.spark.sql.functions
              .monotonically_increasing_id().cast(keyType))) {
        case (df, f) if f.name == pkCol(t) => df
        case (df, f) => df.withColumn(f.name, lit(null).cast(f.dataType))
      }
      nulled.select(base.columns.map(col).toIndexedSeq: _*)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  /** MIXED fixture: the nulled rows UNIONed with real rows (disjoint
    * keys) — null payloads interleaved with healthy ones. Distinct
    * from the all-null fixture: a first-row `headOption` dims/seed
    * read can now see a NULL cell while the frame is non-empty, and
    * every aggregate mixes null and non-null inputs. */
  def writeMixedFixture(spark: SparkSession, src: String, out: String,
      n: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val tmp = s"$out-nullpart"
    writeNulledFixture(spark, src, tmp, n)
    tables.foreach { t =>
      val keyType = spark.read.parquet(s"$src/$t.parquet")
        .schema(pkCol(t)).dataType
      val real = spark.read.parquet(s"$src/$t.parquet").limit(n)
        .withColumn(pkCol(t),
          (org.apache.spark.sql.functions
            .monotonically_increasing_id() + 1000000L).cast(keyType))
      // null rows FIRST so a head()-style read meets the NULL cell
      spark.read.parquet(s"$tmp/$t.parquet").unionByName(real)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    // the nullpart intermediate is consumed above — drop it so the sweep
    // leaves only the five declared fixture dirs on disk
    deleteRecursively(new java.io.File(tmp))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def sweep(spark: SparkSession, dir: String, label: String): Seq[(String, String, String)] = {
    graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).count(); Nil }
      // NonFatal only: a fatal JVM error (OOM, linkage) must abort the
      // sweep, not be recorded as an ordinary FAIL line
      catch { case scala.util.control.NonFatal(e) =>
        val msg = (e.getMessage match {
          case null => e.getClass.getName
          case m    => e.getClass.getSimpleName + ": " + m
        }).linesIterator.take(3).mkString(" | ")
        println(s"FAIL $label $name: $msg")
        Seq((label, name, msg))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outRoot = args.lift(1).getOrElse("target/degen")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    writeFixture(spark, src, s"$outRoot/empty", 0)
    writeFixture(spark, src, s"$outRoot/tiny", 3)
    writeConstFixture(spark, src, s"$outRoot/const", 48)
    writeNulledFixture(spark, src, s"$outRoot/nulled", 3)
    writeMixedFixture(spark, src, s"$outRoot/mixed", 3)
    val fails = sweep(spark, s"$outRoot/empty", "empty") ++
      sweep(spark, s"$outRoot/tiny", "tiny") ++
      sweep(spark, s"$outRoot/const", "const") ++
      sweep(spark, s"$outRoot/nulled", "nulled") ++
      sweep(spark, s"$outRoot/mixed", "mixed")
    println(f"degen sweep: ${graft.SparkEntry.queries.size * 5} runs, " +
      f"${fails.size} failures, ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
    // exit codes wrap mod 256 — a 256-failure catastrophe must not
    // read as a clean pass at the round-close gate
    sys.exit(math.min(fails.size, 255))
  }
}
