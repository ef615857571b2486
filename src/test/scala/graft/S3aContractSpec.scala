package graft

import org.apache.spark.sql.functions._

/** SINK-5 object-store contract, env-gated (VERDICT r10 #7).
  *
  * The offline container has no S3 endpoint and no hadoop-aws jars, so
  * these tests run ONLY when the operator explicitly provides the
  * object-store environment:
  *
  *   SPARK_GRAFT_S3A=1            enable Graft.session's s3a conf
  *                                (magic committer, block upload,
  *                                optional endpoint override)
  *   SPARK_GRAFT_S3_BUCKET=<b>    bucket for sink5's s3a:// target
  *   SPARK_GRAFT_S3_ENDPOINT=<e>  optional, for S3-compatible stores
  *   (credentials via the standard fs.s3a provider chain — graft never
  *   carries secrets; see Graft.withObjectStoreConf)
  *
  * Without that contract each test is CANCELED (assume()), keeping the
  * suite green offline while the same spec certifies the real write path
  * the moment an endpoint exists — run e.g. against MinIO:
  *   SPARK_GRAFT_S3A=1 SPARK_GRAFT_S3_BUCKET=graft-test \
  *   SPARK_GRAFT_S3_ENDPOINT=http://localhost:9000 \
  *   AWS_ACCESS_KEY_ID=... AWS_SECRET_ACCESS_KEY=... \
  *   sbt "testOnly graft.S3aContractSpec"
  */
class S3aContractSpec extends SparkSpec {

  private def s3aConfigured: Boolean =
    sys.env.get("SPARK_GRAFT_S3A").contains("1") &&
      sys.env.contains("SPARK_GRAFT_S3_BUCKET")

  test("sink5 resolves to an s3a:// URI exactly when the env contract " +
      "is present") {
    // always runs: pins the scheme-selection logic both ways without
    // needing a live endpoint
    val t = graft.operators.Scans.sink5Target
    if (s3aConfigured)
      assert(t.startsWith("s3a://"), s"expected s3a target, got $t")
    else
      assert(t.startsWith("file://"), s"expected file target offline, got $t")
  }

  test("session carries the s3a magic-committer conf when enabled") {
    assume(sys.env.get("SPARK_GRAFT_S3A").contains("1"),
      "SPARK_GRAFT_S3A not set — offline container, skipping")
    assert(spark.conf.get("spark.hadoop.fs.s3a.committer.name") === "magic",
      "rename-based commit is not acceptable on an object store")
    assert(spark.conf.get(
      "spark.hadoop.fs.s3a.committer.magic.enabled") === "true")
  }

  // ---- in-process object-store contract (always runs) -------------------
  // The offline container has no hadoop-aws jars, so the s3a:// tests
  // below stay env-gated; these run the SAME write path against the
  // in-process s3m:// FileSystem, whose semantics are S3's (flat keys,
  // PUT-on-close atomicity, per-key COPY+DELETE rename, no append).

  import graft.sources.S3MockFileSystem

  private def s3mReady(): Unit =
    S3MockFileSystem.install(spark.sparkContext.hadoopConfiguration)

  test("s3m: parquet snapshot round-trips through the full Spark commit " +
      "pipeline on object-store semantics") {
    s3mReady()
    val out = "s3m://graft-test/contract/region"
    val want = spark.read.parquet(s"$Sf0001/region.parquet")
      .select("r_regionkey", "r_name").collect().map(_.toSeq).toSet
    spark.read.parquet(s"$Sf0001/region.parquet")
      .write.mode("overwrite").parquet(out)
    val got = spark.read.parquet(out)
      .select("r_regionkey", "r_name").collect().map(_.toSeq).toSet
    assert(got === want)
    // overwrite commits atomically at the version level: re-write and
    // re-read — same answer, no torn listing
    spark.read.parquet(s"$Sf0001/region.parquet")
      .write.mode("overwrite").parquet(out)
    assert(spark.read.parquet(out).count() === want.size.toLong)
  }

  test("s3m: multi-partition write commits every task's file; listing " +
      "sees only committed objects") {
    s3mReady()
    val s = spark
    import s.implicits._
    val out = "s3m://graft-test/contract/multi"
    (1 to 1000).toDF("x").repartition(8)
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.rdd.getNumPartitions >= 1)
    assert(back.agg(org.apache.spark.sql.functions.sum("x")).head.getLong(0)
      === 500500L)
    // no _temporary debris survives the job commit
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .map(_.getPath.getName)
    assert(!names.exists(_.startsWith("_temporary")),
      s"commit must clean its temp dirs, saw ${names.mkString(",")}")
  }

  test("s3m: rename is per-object COPY+DELETE — the measured cost that " +
      "motivates the magic committer at 100 TB") {
    s3mReady()
    val fs = new org.apache.hadoop.fs.Path("s3m://graft-test/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = new org.apache.hadoop.fs.Path("s3m://graft-test/ren/src")
    (0 until 7).foreach { i =>
      val o = fs.create(new org.apache.hadoop.fs.Path(src, s"f$i"))
      o.write(i); o.close()
    }
    val before = S3MockFileSystem.copies.get()
    assert(fs.rename(src, new org.apache.hadoop.fs.Path(
      "s3m://graft-test/ren/dst")))
    assert(S3MockFileSystem.copies.get() - before === 7L,
      "a 7-object prefix rename must cost 7 server-side copies " +
        "(one per key — NOT one atomic metadata op)")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(
      "s3m://graft-test/ren/dst")).length === 7)
    assert(!fs.exists(src))
  }

  test("s3m: keys whose encoded name exceeds the 255-byte filename limit " +
      "store hashed with an exact-listing sidecar (deep committer paths)") {
    s3mReady()
    val fs = new org.apache.hadoop.fs.Path("s3m://graft-test/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a deep hive-partitioned committer-temp shape: '/'→%2F triples, so
    // this key's encoded form is far past 255 bytes — real S3 allows
    // 1024-byte keys and the mock must too
    val deep = "s3m://graft-test/tbl/" +
      (1 to 12).map(i => s"col$i=value_$i").mkString("/") +
      "/_temporary/0/_temporary/attempt_20260816_0001_m_000000_0/" +
      "part-00000-0123456789abcdef-c000.snappy.parquet"
    val p = new org.apache.hadoop.fs.Path(deep)
    val o = fs.create(p)
    o.write("deep".getBytes); o.close()
    assert(fs.exists(p) && fs.getFileStatus(p).getLen === 4L)
    // listing the parent resolves the RAW key through the sidecar
    val parent = p.getParent
    val listed = fs.listStatus(parent).map(_.getPath.getName)
    assert(listed.contains(p.getName), s"hashed key lost in listing: ${listed.mkString(",")}")
    // rename (the committer's task->job promote) and delete still work
    val dst = new org.apache.hadoop.fs.Path(parent, "renamed.parquet")
    assert(fs.rename(p, dst))
    assert(fs.exists(dst) && !fs.exists(p))
    assert(fs.delete(dst, false))
  }

  test("s3m: objects are immutable — append fails; PUT visibility is " +
      "atomic at close") {
    s3mReady()
    val fs = new org.apache.hadoop.fs.Path("s3m://graft-test/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path("s3m://graft-test/imm/a")
    val o = fs.create(p)
    o.write("hello".getBytes)
    // not yet closed → not yet visible (S3 PUT semantics)
    assert(!fs.exists(p), "an open PUT must not be visible")
    o.close()
    assert(fs.exists(p) && fs.getFileStatus(p).getLen === 5L)
    intercept[UnsupportedOperationException] { fs.append(p) }
  }

  test("sink17_object_store declared query lands on the nation oracle") {
    val rows = SparkEntry.queries("sink17_object_store")(spark, Sf0001)
      .collect()
    assert(rows.length === 25, s"nation has 25 rows, got ${rows.length}")
    assert(rows.map(_.getInt(0)).toSeq === (0 until 25))
  }

  test("sink5 round-trips through the object store") {
    assume(s3aConfigured,
      "no object-store env contract — offline container, skipping")
    val rows = SparkEntry.queries("sink5_uri")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.length === 5, s"region has 5 rows, got ${rows.length}")
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    // second write must overwrite atomically (magic committer): re-run
    // and re-read — same answer, no torn/partial listing
    val again = SparkEntry.queries("sink5_uri")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(again.toSeq === rows.toSeq)
  }
}
