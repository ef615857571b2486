package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SchkTest}

/** Adversarial-input properties for the three ingest surfaces
  * ParserFuzzSpec does not cover (VERDICT r19 item 6): scan9's PERMISSIVE
  * CSV, scan11's rowTag-streamed XML, and func_variant's parse_json.
  * Same contract as the ace/EDN suites — REJECT, NEVER CORRUPT: a poison
  * row may be quarantined or null-filled, but must never throw a task,
  * silently alter a neighboring valid row, or parse into plausible wrong
  * values.
  *
  * File-level suites plant VALID rows with known values among ~1k
  * generated garbage lines (one multi-partition read per seed — the
  * 1k-case scale of the pure-parser suites without 1k Spark jobs);
  * the expression-level parse_json suite runs ScalaCheck-generated
  * batches through one DataFrame per property.
  */
class IngestFuzzSpec extends SparkSpec {

  private def check(label: String, cases: Int, p: Prop): Unit = {
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, s"$label: $res")
  }

  /** Nasty line material: quotes, separators, RTL/CJK/emoji, lone
    * surrogates, NULs, backslashes — never a leading ASCII digit, so a
    * garbage line can never accidentally satisfy scan9's "typed fields
    * all parsed" cleanliness (id is the first field). */
  private def nastyLine(rnd: scala.util.Random): String = {
    val atoms = Array("\"", ",", "\\", "\t", " ", "é", "中", "🙂",
      "\u202E", "\uD800", "\u0000", "x", "Z", "_", ";;", "<", ">", "&")
    val n = 1 + rnd.nextInt(20)
    val body = Seq.fill(n)(atoms(rnd.nextInt(atoms.length))).mkString
    // ensure non-digit head even after leading-atom choice
    "g" + body
  }

  // ---- scan9: PERMISSIVE CSV over planted rows + garbage -------------------

  test("PERMISSIVE csv: ~1k garbage lines (quotes, NULs, non-UTF8 bytes, " +
    "10k-char line) never throw and never corrupt the planted rows") {
    val rnd = new scala.util.Random(20260816L)
    val planted = (1 to 100).map(i =>
      (i, i * 3, i * 1.25, s"name_$i"))
    val validLines = planted.map { case (id, qty, price, name) =>
      s"$id,$qty,$price,$name" }
    val garbage = Seq.fill(1000)(nastyLine(rnd)) ++ Seq(
      "x" * 10000,                       // pathological line length
      "1,2,3",                           // arity-short but numeric head:
                                         //   name=null → dirty by contract
      "9999999999999999999,1,1.0,over",  // id overflows int → null → dirty
      "1,notanint,1.0,n",                // one poisoned typed field
      "\"unterminated quote, 5,5,5.0,q") // quote spanning to EOF
    val lines = rnd.shuffle(validLines ++ garbage)
    val dir = Files.createTempDirectory("graft-csvfuzz")
    val f = dir.resolve("fuzz.csv")
    val bytes = ("id,qty,price,name\n" + lines.mkString("\n"))
      .getBytes(StandardCharsets.UTF_8) ++
      // raw invalid-UTF8 bytes as their own line — never a java String
      "\n".getBytes ++ Array(0xFF, 0xFE, 0x80).map(_.toByte) ++
      "\nx_after_binary_garbage".getBytes(StandardCharsets.UTF_8)
    Files.write(f, bytes)
    try {
      val schema = StructType(Seq(
        StructField("id", IntegerType), StructField("qty", IntegerType),
        StructField("price", DoubleType), StructField("name", StringType),
        StructField("_corrupt", StringType)))
      val clean = col("id").isNotNull && col("qty").isNotNull &&
        col("price").isNotNull && col("name").isNotNull
      val rows = spark.read.schema(schema)
        .option("header", "true").option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(f.toString)
        .repartition(16) // garbage crosses task boundaries
        .select(col("id"), col("qty"), col("price"), col("name"),
          clean.as("is_clean"))
        .collect() // must not throw — the whole point
      val cleanById = rows.filter(_.getBoolean(4))
        .filter(r => !r.isNullAt(0) && r.getInt(0) >= 1 && r.getInt(0) <= 100)
        .map(r => r.getInt(0) -> ((r.getInt(1), r.getDouble(2),
          r.getString(3)))).toMap
      // every planted row survived the surrounding garbage byte-exactly
      planted.foreach { case (id, qty, price, name) =>
        assert(cleanById.get(id).contains((qty, price, name)),
          s"planted row $id corrupted or lost: ${cleanById.get(id)}")
      }
      assert(cleanById.size == 100, "a garbage line stole a planted id")
      // the garbage actually exercised the quarantine path
      assert(rows.count(!_.getBoolean(4)) > 500,
        "garbage rows unexpectedly parsed clean")
    } finally {
      Files.deleteIfExists(f); Files.deleteIfExists(dir): Unit
    }
  }

  // ---- scan11: rowTag XML over planted rows + garbage -----------------------

  test("rowTag xml: malformed rows, stray text, comments, CDATA never " +
    "throw and never corrupt the planted rows") {
    val rnd = new scala.util.Random(816L)
    val planted = (1 to 50).map(i =>
      (i, if (i % 2 == 0) "image" else "audio", s"title &amp; $i", i * 100L,
        (0 until i % 4).map(t => s"t$t")))
    val validRows = planted.map { case (id, kind, title, b, tags) =>
      val tagXml =
        if (tags.isEmpty) "<tags/>"
        else tags.map(t => s"<tag>$t</tag>").mkString("<tags>", "", "</tags>")
      s"""<media id="$id" kind="$kind"><title>$title</title>""" +
        s"""<bytes>$b</bytes>$tagXml</media>"""
    }
    val garbageRows = Seq(
      """<media id="998"><bytes>NaN</bytes></media>""",   // untyped bytes
      """<media id="997" kind="x"><title><![CDATA[<raw>]]></title><bytes>1</bytes></media>""",
      "<!-- a comment between rows -->",
      // markup chars stripped so the stray text stays stray; NULs
      // stripped because U+0000 is an ILLEGAL XML CHARACTER (XML 1.0
      // forbids it outright) — a NUL mid-document is an ill-formed
      // STREAM, and the parser's response is the split-suffix blast
      // radius pinned by the test below, not per-row quarantine
      "stray text between row tags " + Seq.fill(50)(
        nastyLine(rnd).replaceAll("[<>&\\u0000]", "")).mkString(" "),
      """<notmedia><media-like/></notmedia>""")
    // A structurally-MALFORMED row (mismatched interior close tag) does
    // NOT quarantine as one row: the parser error consumes the REST OF
    // THE SPLIT into a single corrupt record (pinned by the blast-radius
    // test below). It therefore goes LAST here — the other garbage forms
    // above are the ones with per-row quarantine semantics.
    val malformedLast = """<media id="bad"><title>unclosed</media>"""
    val body = (rnd.shuffle(validRows ++ garbageRows) :+ malformedLast)
      .mkString("\n")
    val dir = Files.createTempDirectory("graft-xmlfuzz")
    val f = dir.resolve("fuzz.xml")
    Files.write(f, s"<catalog>\n$body\n</catalog>"
      .getBytes(StandardCharsets.UTF_8))
    try {
      // THE SHARP EDGE, documented (not pinned — it flips with column
      // pruning): PERMISSIVE quarantines malformed XML, but a WELL-FORMED
      // row whose TYPED ATTRIBUTE fails to cast (id="bad" as IntegerType)
      // can throw NumberFormatException out of the read and kill the task
      // under a pruned projection — attribute casts bypass the
      // corrupt-record path. A 100 TB ingest over junk-bearing XML must
      // therefore type attributes as STRING and try_cast after the scan —
      // the robust pattern this test pins end to end:
      val schema = StructType(Seq(
        StructField("_id", StringType), StructField("_kind", StringType),
        StructField("title", StringType), StructField("bytes", LongType),
        StructField("tags", StructType(Seq(
          StructField("tag", ArrayType(StringType)))))))
      val rows = spark.read.option("rowTag", "media")
        .option("mode", "PERMISSIVE").schema(schema)
        .xml(f.toString)
        .select(expr("try_cast(_id AS int)").as("id"), col("_kind"),
          col("title"), col("bytes"),
          coalesce(size(col("tags.tag")), lit(0)).as("n_tags"))
        .collect() // must not throw
      val byId = rows.filter(r => !r.isNullAt(0))
        .filter(r => r.getInt(0) >= 1 && r.getInt(0) <= 50)
        .map(r => r.getInt(0) -> ((r.getString(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))).toMap
      planted.foreach { case (id, kind, _, b, tags) =>
        val got = byId.get(id)
        assert(got.exists { case (k, title, by, nt) =>
          k == kind && by == b && nt == tags.size &&
            title == s"title & $id" // entity decoded, not raw
        }, s"planted media $id corrupted or lost: $got")
      }
      assert(byId.size == 50, "a malformed row stole a planted id")
    } finally {
      Files.deleteIfExists(f); Files.deleteIfExists(dir): Unit
    }
  }

  test("rowTag xml: a structurally-malformed row consumes the REST OF ITS " +
    "SPLIT as one corrupt record — the blast radius, pinned") {
    // The 100 TB consequence: one mismatched close tag inside a 128 MB
    // split silently loses every row after it IN THAT SPLIT under
    // PERMISSIVE (they ride along inside the corrupt record, invisible to
    // the typed columns). Dirty-XML ingest must bound the radius with
    // smaller splits or pre-validation, and must MONITOR the corrupt
    // column — this test pins the semantics so an upstream change to
    // per-row quarantine is noticed (and celebrated).
    val rows = (1 to 3).map(i =>
      s"""<media id="$i" kind="a"><title>t$i</title><bytes>${i * 100}</bytes><tags/></media>""")
    val bad = """<media id="bad"><title>unclosed</media>"""
    val dir = Files.createTempDirectory("graft-xmlblast")
    val f = dir.resolve("blast.xml")
    Files.write(f, ("<catalog>\n" + rows(0) + "\n" + bad + "\n" +
      rows(1) + "\n" + rows(2) + "\n</catalog>")
      .getBytes(StandardCharsets.UTF_8))
    try {
      val schema = StructType(Seq(
        StructField("_id", StringType), StructField("title", StringType),
        StructField("_corrupt", StringType)))
      val got = spark.read.option("rowTag", "media")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(schema).xml(f.toString)
        .select(col("_id"), col("_corrupt")).collect()
      val ids = got.flatMap(r => Option(r.getString(0)))
      assert(ids.toSeq == Seq("1"),
        s"expected only the pre-error row to parse, got ${ids.toSeq}")
      val corrupt = got.flatMap(r => Option(r.getString(1)))
      assert(corrupt.length == 1 && corrupt.head.contains("id=\"2\"") &&
        corrupt.head.contains("id=\"3\""),
        "rows after the malformed one must be inside the ONE corrupt record")
    } finally {
      Files.deleteIfExists(f); Files.deleteIfExists(dir): Unit
    }
  }

  // ---- parse_json / VARIANT -------------------------------------------------

  /** JSON-safe string: printable, no quotes/backslash/control chars —
    * renders identically through this generator and Spark's to_json, so
    * round-trips can compare bytes. */
  private val jsonSafeString: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("é"),
      Gen.const("中"), Gen.const("🙂"), Gen.const("_"))).map(_.mkString)

  /** Bounded random JSON value tree rendered compactly (insertion-order
    * keys, integer numbers only — both properties Spark's variant
    * to_json preserves, making the round-trip byte-exact). */
  private def jsonTree(depth: Int): Gen[String] = {
    val scalar: Gen[String] = Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toString),
      jsonSafeString.map(s => "\"" + s + "\""),
      Gen.oneOf("true", "false", "null"))
    if (depth <= 0) scalar
    else Gen.frequency(
      3 -> scalar,
      1 -> Gen.listOf(jsonTree(depth - 1)).map(_.take(4))
        .map(_.mkString("[", ",", "]")),
      1 -> (for {
        n <- Gen.chooseNum(0, 4)
        ks <- Gen.listOfN(n, Gen.identifier.map(_.take(6)))
        vs <- Gen.listOfN(n, jsonTree(depth - 1))
      } yield ks.distinct.zip(vs)
        .map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")))
  }

  /** Canonical form of a compact JSON text for semantic comparison:
    * objects re-rendered with keys SORTED (variant's binary dictionary
    * re-orders object fields, so the round-trip preserves content, not
    * key order), arrays and scalars verbatim. Minimal recursive-descent
    * parser over the generator's own grammar (compact, integer numbers,
    * escape-free strings) — not a general JSON parser. */
  private def canonJson(s: String): String = {
    var i = 0
    def ws(): Unit = while (i < s.length && s(i) == ' ') i += 1
    def value(): String = {
      ws()
      s(i) match {
        case '{' =>
          i += 1; ws()
          val fields = scala.collection.mutable.ArrayBuffer[(String, String)]()
          while ({ ws(); s(i) != '}' }) {
            if (s(i) == ',') { i += 1; ws() }
            val k = value() // a string
            ws(); require(s(i) == ':', s"expected : at $i"); i += 1
            fields += ((k, value()))
          }
          i += 1
          fields.sortBy(_._1)
            .map { case (k, v) => s"$k:$v" }.mkString("{", ",", "}")
        case '[' =>
          i += 1; ws()
          val items = scala.collection.mutable.ArrayBuffer[String]()
          while ({ ws(); s(i) != ']' }) {
            if (s(i) == ',') { i += 1; ws() }
            items += value()
          }
          i += 1
          items.mkString("[", ",", "]")
        case '"' =>
          val st = i; i += 1
          while (s(i) != '"') i += 1
          i += 1
          s.substring(st, i)
        case _ =>
          val st = i
          while (i < s.length && !",]}: ".contains(s(i))) i += 1
          s.substring(st, i)
      }
    }
    value()
  }

  test("parse_json: compact JSON trees round-trip through VARIANT " +
    "content-exactly (1k generated trees, one Spark job)") {
    val trees = Gen.listOfN(1000, jsonTree(3)).sample.get
    import spark.implicits._
    val got = trees.toDF("j")
      .select(to_json(parse_json(col("j"))).as("out"), col("j"))
      .collect()
    // content equality modulo object-key order (which variant's binary
    // dictionary legitimately normalizes); everything else — values,
    // array order, non-ASCII strings, long-range integers — byte-exact
    val bad = got.filter(r =>
      canonJson(r.getString(0)) != canonJson(r.getString(1)))
    assert(bad.isEmpty,
      s"${bad.length} trees mutated; first: ${bad.headOption.map(_.toSeq)}")
  }

  test("try_parse_json: arbitrary garbage strings null out, never throw, " +
    "never parse into a non-equivalent variant (1k cases)") {
    val rnd = new scala.util.Random(42L)
    val garbage = Seq.fill(1000)(nastyLine(rnd)) ++ Seq(
      "{", "}", "[1,", "{\"a\":}", "\"unterminated", "{\"a\" 1}",
      "[1 2]", "nul", "TRUE", "01", "1.2.3", "{\"a\":1,}", "",
      "\u0000", "{\"\uD800\":1}", "x" * 100000)
    import spark.implicits._
    val rows = garbage.toDF("j")
      .select(col("j"),
        expr("try_parse_json(j)").isNull.as("rejected"),
        to_json(expr("try_parse_json(j)")).as("reparsed"))
      .collect() // no task may throw
    // reject-never-corrupt: anything NOT rejected must round-trip to a
    // string DuckDB-style JSON-equal to some parse of itself — we assert
    // the weaker engine-internal invariant: re-parsing the rendered form
    // reproduces it (fixed point), so an "accepted" garbage line is at
    // least self-consistent, never half-parsed junk
    val accepted = rows.filter(!_.getBoolean(1)).map(_.getString(2))
    if (accepted.nonEmpty) {
      val fixed = accepted.toSeq.toDF("j")
        .select(col("j"), to_json(parse_json(col("j"))).as("j2"))
        .collect()
      assert(fixed.forall(r => r.getString(0) == r.getString(1)),
        "an accepted garbage string is not a parse fixed point")
    }
  }

  test("variant_get: flat typed extraction agrees with the generated " +
    "scalars (1k generated objects, one Spark job)") {
    // func_variant's shape with generated values instead of table columns
    val gen = for {
      u <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      t <- jsonSafeString
    } yield (u, t)
    val cases = Gen.listOfN(1000, gen).sample.get
    import spark.implicits._
    val got = cases.map { case (u, t) => (u, t, s"""{"u":$u,"t":"$t"}""") }
      .toDF("u0", "t0", "j")
      .select(col("u0"), col("t0"),
        expr("variant_get(parse_json(j), '$.u', 'long')").as("u"),
        expr("variant_get(parse_json(j), '$.t', 'string')").as("t"))
      .collect()
    val bad = got.filter(r =>
      r.getLong(0) != r.getLong(2) || r.getString(1) != r.getString(3))
    assert(bad.isEmpty,
      s"${bad.length} extractions drifted; first: ${bad.headOption.map(_.toSeq)}")
  }
}
