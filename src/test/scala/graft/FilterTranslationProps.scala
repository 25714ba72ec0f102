package graft

import graft.read.GraftMorRelation
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property pin for the format relations' filter translator
  * ([[GraftMorRelation.toColumn]]), which is now load-bearing for three V1
  * relations: for RANDOM filter trees over a fixed row set, the rows kept
  * by the translated Column must equal the rows kept by an in-memory
  * evaluator of the source `Filter` semantics (three-valued logic: a row
  * passes only when the predicate is definitely TRUE — exactly Spark's
  * filter contract, including null handling). */
object FilterTranslationProps extends Properties("GraftMorRelation.toColumn") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private lazy val spark = TestSpark.spark

  /** (id, s: nullable string, n: nullable long) — nulls included so the
    * three-valued-logic behavior is exercised, not just the happy path. */
  private val rows: Seq[(Long, Option[String], Option[Long])] = Seq(
    (0L, Some("apple"), Some(1L)), (1L, Some("banana"), Some(5L)),
    (2L, None, Some(10L)), (3L, Some("cherry"), None),
    (4L, Some("apple pie"), Some(-3L)), (5L, None, None),
    (6L, Some(""), Some(0L)), (7L, Some("Banana"), Some(5L)))

  private def df: DataFrame = {
    import spark.implicits._
    rows.toDF("id", "s", "n")
  }

  private val genStrVal: Gen[String] =
    Gen.oneOf("apple", "banana", "cherry", "", "nope", "an")
  private val genNumVal: Gen[Long] = Gen.oneOf(-3L, 0L, 1L, 5L, 10L, 7L)

  private val genLeaf: Gen[Filter] = Gen.oneOf(
    genStrVal.map(v => EqualTo("s", v)),
    genNumVal.map(v => EqualTo("n", v)),
    genStrVal.map(v => EqualNullSafe("s", v)),
    genNumVal.map(v => GreaterThan("n", v)),
    genNumVal.map(v => GreaterThanOrEqual("n", v)),
    genNumVal.map(v => LessThan("n", v)),
    genNumVal.map(v => LessThanOrEqual("n", v)),
    Gen.listOfN(2, genStrVal).map(vs => In("s", vs.toArray[Any])),
    Gen.listOfN(2, genNumVal).map(vs => In("n", vs.toArray[Any])),
    Gen.const(IsNull("s")), Gen.const(IsNotNull("s")),
    Gen.const(IsNull("n")), Gen.const(IsNotNull("n")),
    genStrVal.map(StringStartsWith("s", _)),
    genStrVal.map(StringEndsWith("s", _)),
    genStrVal.map(StringContains("s", _)),
    Gen.const(AlwaysTrue()), Gen.const(AlwaysFalse()))

  private def genTree(depth: Int): Gen[Filter] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> Gen.lzy(for {
        l <- genTree(depth - 1); r <- genTree(depth - 1)
      } yield And(l, r)),
      1 -> Gen.lzy(for {
        l <- genTree(depth - 1); r <- genTree(depth - 1)
      } yield Or(l, r)),
      1 -> Gen.lzy(genTree(depth - 1).map(Not(_))))

  /** In-memory three-valued evaluation of a source Filter over one row:
    * Some(bool) = definite, None = unknown (null operand). */
  private def eval3(f: Filter,
      s: Option[String], n: Option[Long]): Option[Boolean] = {
    def str(op: String => Boolean): Option[Boolean] = s.map(op)
    def num(op: Long => Boolean): Option[Boolean] = n.map(op)
    f match {
      case EqualTo("s", v: String) => str(_ == v)
      case EqualTo("n", v: Long) => num(_ == v)
      case EqualNullSafe("s", v: String) => Some(s.contains(v))
      case GreaterThan("n", v: Long) => num(_ > v)
      case GreaterThanOrEqual("n", v: Long) => num(_ >= v)
      case LessThan("n", v: Long) => num(_ < v)
      case LessThanOrEqual("n", v: Long) => num(_ <= v)
      case In("s", vs) => str(x => vs.exists(_ == x))
      case In("n", vs) => num(x => vs.exists(_ == x))
      case IsNull("s") => Some(s.isEmpty)
      case IsNotNull("s") => Some(s.nonEmpty)
      case IsNull("n") => Some(n.isEmpty)
      case IsNotNull("n") => Some(n.nonEmpty)
      case StringStartsWith("s", v) => str(_.startsWith(v))
      case StringEndsWith("s", v) => str(_.endsWith(v))
      case StringContains("s", v) => str(_.contains(v))
      case AlwaysTrue() => Some(true)
      case AlwaysFalse() => Some(false)
      case And(l, r) => (eval3(l, s, n), eval3(r, s, n)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval3(l, s, n), eval3(r, s, n)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => eval3(c, s, n).map(!_)
      case other => sys.error(s"generator produced untranslatable $other")
    }
  }

  property("translated Column keeps exactly the definitely-true rows") =
    Prop.forAll(genTree(3)) { filter =>
      val colOpt = GraftMorRelation.toColumn(filter)
      // every generated shape is translatable by construction
      colOpt.isDefined :| s"untranslated: $filter" && {
        val got = df.filter(colOpt.get)
          .select("id").collect().map(_.getLong(0)).toSet
        val want = rows.collect {
          case (id, s, n) if eval3(filter, s, n).contains(true) => id
        }.toSet
        (got == want) :| s"filter $filter: spark=$got model=$want"
      }
    }

}
