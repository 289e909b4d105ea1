package graft.validate

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model.Schemas
import graft.model.Schemas.ColumnPattern

/** Pandera-parity validation semantics (reference: py_pipeline/validate.py):
  * presence, dtype, coercion, nullability, and LAZY accumulation of all
  * violations.
  */
class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))

  test("conforming frame passes unchanged") {
    val df = Seq((1L, "a")).toDF("id", "name")
    assert(Validator.validate(df, schema).isRight)
  }

  test("int column coerces to declared long (pandera coerce=True)") {
    val df = Seq((1, "a")).toDF("id", "name")
    val out = Validator.validate(df, schema)
    assert(out.isRight)
    assert(out.toOption.get.schema("id").dataType == LongType)
  }

  test("missing column and wrong dtype accumulate lazily, not fail-fast") {
    val df = Seq(("x", true)).toDF("name", "extra")
      .selectExpr("name", "named_struct('a', 1) as id") // struct, not coercible
    val out = Validator.validate(df, schema)
    assert(out.isLeft)
    val checks = out.left.toOption.get.map(_.check)
    assert(checks.contains("dtype"))
  }

  test("null in declared non-nullable column is a violation") {
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("id", "name")
    val out = Validator.validate(df, schema)
    assert(out.isLeft)
    assert(out.left.toOption.get.exists(_.check == "not_nullable"))
  }

  test("validateOrThrow raises one exception carrying ALL violations") {
    val df = Seq((Some(1L), "ok"), (None, "bad")).toDF("id", "name")
    val e = intercept[Validator.SchemaValidationException] {
      Validator.validateOrThrow(df, StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = true),
        StructField("ghost", StringType, nullable = true))))
    }
    assert(e.violations.size == 2) // missing ghost + null id, in one throw
  }

  test("validateWide: pattern match + coercion + unmatched column violation") {
    val df = Seq(("2024-01-01 00:00:00", 1.0f, 5, "junk"))
      .toDF("ts", "Open_AAPL", "Volume_AAPL", "bogus")
      .selectExpr("cast(ts as timestamp) as Date", "Open_AAPL", "Volume_AAPL", "bogus")
    // default (pandera strict=False): unmatched columns pass through
    assert(Validator.validateWide(df, Schemas.rawPricePatterns,
      Schemas.rawPriceIndex).isRight)
    // strict mode flags them
    val out = Validator.validateWide(df, Schemas.rawPricePatterns,
      Schemas.rawPriceIndex, strict = true)
    assert(out.isLeft)
    assert(out.left.toOption.get.exists(_.column == "bogus"))

    val ok = Validator.validateWide(df.drop("bogus"),
      Schemas.rawPricePatterns, Schemas.rawPriceIndex)
    assert(ok.isRight)
    val sch = ok.toOption.get.schema
    assert(sch("Open_AAPL").dataType == DoubleType)  // float -> double coerced
    assert(sch("Volume_AAPL").dataType == LongType)  // int -> long coerced
  }

  test("quarantine splits null-violating rows instead of failing the batch") {
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), null))
      .toDF("id", "name")
    val out = Validator.quarantine(df, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = false))))
    assert(out.isRight)
    val (valid, invalid) = out.toOption.get
    assert(valid.count() == 1)
    assert(invalid.count() == 2)
    val viol = invalid.orderBy(col("name").asc_nulls_last)
      .select("__violations").collect().map(_.getSeq[String](0))
    assert(viol(0) == Seq("id"))    // row ("b"): null id
    assert(viol(1) == Seq("name"))  // row (3): null name sorts last
  }

  test("quarantine still fails fast on structural violations") {
    val df = Seq((1L, "a")).toDF("id", "name")
    val out = Validator.quarantine(df, StructType(Seq(
      StructField("ghost", StringType, nullable = false))))
    assert(out.isLeft)
  }

  test("validateWide flags a wrong-typed Date index") {
    val df = Seq(("2024-01-01", 1.0)).toDF("Date", "Open_A")
    val out = Validator.validateWide(df, Schemas.rawPricePatterns, Schemas.rawPriceIndex)
    assert(out.isLeft)
    assert(out.left.toOption.get.exists(_.check == "check_index_dtype"))
  }
}
