package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Codegen-compilation lock for the custom-expression hot paths.
  *
  * Spark falls back to interpreted evaluation SILENTLY when generated
  * Java fails to compile (rc stays 0, results stay correct, only a
  * WARN in the log) — which is exactly how round 6 shipped a
  * DotProduct whose generated code was invalid whenever its inputs
  * were non-nullable: every vector query ran interpreted and nothing
  * failed. This suite removes the safety net: with
  * `spark.sql.codegen.fallback=false` a whole-stage CompileException
  * aborts the query, and with `codegen.factoryMode=CODEGEN_ONLY`
  * non-whole-stage projections (where the round-6 failure actually
  * surfaced, in an UnsafeProjection) must compile too. Any future
  * custom Expression whose doGenCode emits invalid Java fails here
  * instead of silently degrading the bench.
  */
class CodegenSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("codegen-suite")
      .withExtensions(new graft.lake.LakeExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // no interpreted safety net: compile failures must THROW
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ready: Boolean = new java.io.File(sfDir).isDirectory

  // every pure-query operator (relational, text, vector): the lake
  // queries stay out — they run DDL/DML against a catalog this
  // sessionless suite doesn't mount, and their scan path is codegen-
  // locked transitively through the same expressions
  private val pureQueries =
    (graft.queries.Relational.queries.keys ++
      graft.queries.TextOps.queries.keys ++
      graft.queries.VectorOps.queries.keys).toSeq.sorted

  for (name <- pureQueries) {
    test(s"$name compiles under CODEGEN_ONLY / fallback=false") {
      assume(ready)
      // the assertion IS the collect: under fallback=false a codegen
      // CompileException aborts the query (row counts are the
      // correctness gate's job — v_neardup_pairs is legitimately
      // empty at sf0.001)
      SparkEntry.queries(name)(spark, sfDir).collect()
    }
  }

  test("graft_dot is registered as a SQL function (LakeExtensions)") {
    assume(ready)
    // the SQL surface builds the same codegen'd expression the
    // DataFrame API uses — verified under CODEGEN_ONLY like the rest
    val row = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_dot(array(CAST(1.5 AS FLOAT)),
        |                 array(CAST(2.0 AS FLOAT))) AS f""".stripMargin)
      .collect().head
    assert(row.getDouble(0) == 11.0 && row.getDouble(1) == 3.0)
    // arity is enforced at resolution
    intercept[Exception] { spark.sql("SELECT graft_dot(array(1.0D))") }
  }

  test("DotProduct codegen compiles for NON-NULLABLE inputs (r6 regression)") {
    assume(ready)
    import graft.functions.VectorFunctions
    import org.apache.spark.sql.functions._
    // Array literals are non-nullable with containsNull=false — the
    // exact shape that made BinaryExpression report nullable=false
    // while doGenCode assigned `ev.isNull = true`, so janino rejected
    // the generated projection ("not an rvalue") in round 6. Under
    // CODEGEN_ONLY this collect() throws if that regresses.
    val lit1 = typedLit(Seq(1.0f, 2.0f))
    val lit2 = typedLit(Seq(3.0f, 4.0f))
    val out = spark.range(1).select(VectorFunctions.dot(lit1, lit2).as("d"))
    assert(!out.schema("d").nullable,
      "non-nullable inputs with non-null elements => non-nullable result")
    assert(out.collect().map(_.getDouble(0)).toSeq == Seq(11.0))
  }

  test("DotProduct is nullable — and yields null — when elements can be null") {
    assume(ready)
    import graft.functions.VectorFunctions
    import org.apache.spark.sql.functions._
    // CreateArray over a nullable child => containsNull=true: the
    // result schema must be nullable (declaring false here was the
    // round-6 contract violation), and a null element must null the
    // whole product, in codegen, matching nullSafeEval.
    val a = array(lit(1.0f), lit(null).cast("float"))
    val b = array(lit(3.0f), lit(4.0f))
    val out = spark.range(1).select(
      VectorFunctions.dot(a, b).as("dn"),
      VectorFunctions.dot(b, b).as("dv"))
    assert(out.schema("dn").nullable,
      "nullable elements must make the result nullable")
    val row = out.collect().head
    assert(row.isNullAt(0), "null element must null the dot product")
    assert(row.getDouble(1) == 25.0)
  }

  test("PlaneSigns: packed bits match the per-plane dot composition") {
    assume(ready)
    import graft.functions.{PlaneSigns, VectorFunctions}
    import org.apache.spark.sql.functions._
    // one fused loop vs the when(graft_dot > 0) composition it
    // replaced — bit g of word g/64 must equal the sign of the same
    // left-to-right double accumulation, across the 64-bit word
    // boundary (128 planes). Runs under CODEGEN_ONLY.
    val vecs = Seq(
      Array.tabulate(64)(i => (math.sin(i * 1.7) * 3).toFloat),
      Array.tabulate(64)(i => if (i % 3 == 0) -1.5f else 0.25f),
      Array.fill(64)(0.0f))
    val df = spark.createDataFrame(
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) })
      .toDF("id", "v")
    val nPlanes = 128
    val sigRows = df.select(col("id"),
      VectorFunctions.planeSigns(col("v"), nPlanes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val planeCols = (0 until nPlanes).map { g =>
      when(VectorFunctions.dot(col("v"),
        typedLit(PlaneSigns.planeAt(g).toSeq)) > 0, 1L).otherwise(0L)
        .as(s"b$g")
    }
    val bitRows = df.select(col("id") +: planeCols: _*)
      .collect().map(r => r.getLong(0) ->
        (0 until nPlanes).map(g => r.getLong(g + 1))).toMap
    for ((id, bits) <- bitRows; g <- 0 until nPlanes) {
      val word = sigRows(id)(g / 64)
      assert(((word >>> (g % 64)) & 1L) == bits(g),
        s"vector $id plane $g: packed bit != composition sign")
    }
    // interpreted eval (direct call) agrees with the codegen'd result
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    val expr = PlaneSigns(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        new GenericArrayData(vecs.head.map(_.toDouble)),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, false)), nPlanes)
    val interp = expr.eval(null).asInstanceOf[ArrayData].toLongArray()
    assert(interp.toSeq == sigRows(0L).toSeq,
      "interpreted PlaneSigns must equal codegen output")
    // null element => all-zero signature (when(dot > 0) over a null
    // dot buckets to 0); null array => null
    val edge = spark.range(1).select(
      VectorFunctions.planeSigns(
        array(lit(1.0f), lit(null).cast("float")), 70).as("z"),
      VectorFunctions.planeSigns(
        lit(null).cast("array<float>"), 70).as("n"))
      .collect().head
    assert(edge.getSeq[Long](0).forall(_ == 0L),
      "null element must yield the all-zero signature")
    assert(edge.isNullAt(1), "null array must yield null")
  }

  test("graft_nfc is registered as a SQL function and composes NFC") {
    assume(ready)
    // decomposed e+U+0301 composes to U+00E9 (length 2 -> 1); ASCII
    // and null pass through; runs under CODEGEN_ONLY like the rest
    val row = spark.sql(
      """SELECT length(graft_nfc(concat('Cafe', 'e', '́'))) AS n,
        |       graft_nfc('plain ascii') AS a,
        |       graft_nfc(CAST(NULL AS STRING)) AS z""".stripMargin)
      .collect().head
    assert(row.getInt(0) == 5, "NFC must compose e+combining-acute")
    assert(row.getString(1) == "plain ascii")
    assert(row.isNullAt(2))
    intercept[Exception] { spark.sql("SELECT graft_nfc('a', 'b')") }
  }

  test("NfcNormalize: interpreted eval matches codegen (fast paths incl.)") {
    assume(ready)
    import graft.functions.NfcNormalize
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq(
      "plain ascii",                     // full-ASCII fast path
      "café composed",              // already-NFC fast path
      "café decomposed",           // real composition work
      "Ångström mixed")
    for (c <- cases) {
      val viaExpr = NfcNormalize.nfc(UTF8String.fromString(c)).toString
      val viaJava =
        java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC)
      assert(viaExpr == viaJava, s"mismatch for <$c>")
    }
  }

  test("graft_nfkc is registered as a SQL function and folds compatibility") {
    assume(ready)
    // fullwidth ASCII folds to ASCII (the CJK spam-mirror case), the
    // fi ligature expands, superscript 2 folds to the digit; plain
    // ASCII and null pass through -- all under CODEGEN_ONLY
    val row = spark.sql(
      "SELECT graft_nfkc('\uFF21\uFF22\uFF23\uFF11\uFF12\uFF13') AS fw," +
        " graft_nfkc('e\uFB03cient x\u00B2') AS lig," +
        " graft_nfkc('plain ascii') AS a," +
        " graft_nfkc(CAST(NULL AS STRING)) AS z")
      .collect().head
    assert(row.getString(0) == "ABC123",
      s"fullwidth must fold to ASCII, got <${row.getString(0)}>")
    assert(row.getString(1) == "efficient x2")
    assert(row.getString(2) == "plain ascii")
    assert(row.isNullAt(3))
    intercept[Exception] { spark.sql("SELECT graft_nfkc('a', 'b')") }
  }

  test("NfkcFold: interpreted eval matches codegen and java.text.Normalizer") {
    assume(ready)
    import graft.functions.NfkcFold
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq(
      "plain ascii",                    // full-ASCII fast path
      "caf\u00e9 composed",             // already-NFKC fast path
      "\uFF21\uFF22\uFF23\uFF11",           // fullwidth -> ASCII
      "\uFB01ne \u2460 \u212A",            // fi ligature, circled 1, Kelvin
      "x\u00B2 + e\u0301")               // superscript + combining mark
    for (c <- cases) {
      // the static entry point IS both paths (defineCodeGen emits the
      // same call nullSafeEval makes), so locking it against
      // java.text.Normalizer locks all three ways
      val viaExpr = NfkcFold.nfkc(UTF8String.fromString(c)).toString
      val viaJava =
        java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFKC)
      assert(viaExpr == viaJava, s"mismatch for <$c>")
    }
  }

  test("nfkc fold makes a fullwidth mirror collide with its ASCII twin") {
    assume(ready)
    // the pipeline wiring claim: folding as a PRE-stage of the NFC
    // match key makes a fullwidth spam mirror dedup against the
    // original, while the unfolded key keeps them distinct
    import org.apache.spark.sql.functions._
    import graft.functions.StringFunctions
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "free crypto now"),
      (2L, "\uFF46\uFF52\uFF45\uFF45 \uFF43\uFF52\uFF59\uFF50\uFF54\uFF4F \uFF4E\uFF4F\uFF57"))
      .toDF("doc_id", "text")
    val keys = df.select(
      md5(StringFunctions.nfc(col("text")).cast("binary")).as("nfc_key"),
      md5(StringFunctions.nfkc(StringFunctions.nfc(col("text")))
        .cast("binary")).as("folded_key"))
      .collect()
    assert(keys(0).getString(0) != keys(1).getString(0),
      "NFC alone must NOT fold fullwidth (it is canonical-only)")
    assert(keys(0).getString(1) == keys(1).getString(1),
      "NFKC pre-stage must make the fullwidth mirror collide")
  }
}
