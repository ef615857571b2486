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
