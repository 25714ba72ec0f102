package graft.read

import graft.format.ColStat
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Soundness pin for the column-stats file-skipping evaluator, now
  * load-bearing on TWO paths: the delta-free [[GraftFileIndex]] listing and
  * the MOR slice-level skip in [[GraftMorRelation]]. For RANDOM files (row
  * sets with nulls) and RANDOM pushed-filter trees: whenever the evaluator
  * says a file cannot match ([[GraftFileIndex.mayMatchFile]] = false over
  * the [[GraftMorRelation.statsPredicate]] translation of the filters), the
  * file must truly contain NO row on which the filter is definitely true —
  * skipping is allowed to be conservative (keep a non-matching file), never
  * lossy (drop a matching one).
  *
  * The stats are computed exactly as the slice writer records them:
  * min/max of the non-null values rendered through a string cast, plus the
  * null count ([[graft.write.SliceFiles]]).
  */
object StatsSkippingProps extends Properties("GraftFileIndex.mayMatch") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val schema = StructType(Seq(
    StructField("s", StringType, nullable = true),
    StructField("n", LongType, nullable = true)))

  private val strPool =
    Seq("apple", "banana", "cherry", "", "nope", "an", "apple pie", "Banana")
  private val numPool = Seq(-3L, 0L, 1L, 5L, 7L, 10L, 42L)

  private val genRow: Gen[(Option[String], Option[Long])] = for {
    s <- Gen.option(Gen.oneOf(strPool))
    n <- Gen.option(Gen.oneOf(numPool))
  } yield (s, n)

  private val genFile: Gen[Seq[(Option[String], Option[Long])]] =
    Gen.choose(0, 8).flatMap(Gen.listOfN(_, genRow))

  private val genStrVal: Gen[String] = Gen.oneOf(strPool :+ "zzz")
  private val genNumVal: Gen[Long] = Gen.oneOf(numPool :+ 99L)

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
    // shapes statsPredicate does NOT translate — they must degrade to
    // "no evidence", never to a wrong skip
    genStrVal.map(StringEndsWith("s", _)),
    genStrVal.map(StringContains("s", _)))

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

  /** The writer's stats for one file (SliceFiles contract: min/max of the
    * non-null values via string cast; null count). */
  private def statsOf(rows: Seq[(Option[String], Option[Long])])
      : Map[String, ColStat] = {
    val ss = rows.flatMap(_._1); val ns = rows.flatMap(_._2)
    Map(
      "s" -> ColStat(ss.minOption, ss.maxOption,
        Some(rows.count(_._1.isEmpty).toLong)),
      "n" -> ColStat(ns.minOption.map(_.toString),
        ns.maxOption.map(_.toString),
        Some(rows.count(_._2.isEmpty).toLong)))
  }

  /** Three-valued row evaluation of the source Filter semantics. */
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
      case other => sys.error(s"generator produced unexpected $other")
    }
  }

  property("a skipped file never contains a definitely-matching row") =
    Prop.forAll(genFile, genTree(3)) { (rows, filter) =>
      GraftMorRelation.statsPredicate(filter, schema) match {
        case None => Prop.passed // untranslatable: no skip evidence at all
        case Some(pred) =>
          val parsed = GraftFileIndex.parse(statsOf(rows), schema)
          val may = GraftFileIndex.mayMatchFile(Seq(pred), Some(parsed))
          val hasMatch = rows.exists { case (s, n) =>
            eval3(filter, s, n).contains(true)
          }
          (may || !hasMatch) :|
            s"filter $filter skipped a file containing a match: $rows"
      }
    }

  property("exact stats skip every value-impossible equality") =
    Prop.forAll(genFile) { rows =>
      val parsed = GraftFileIndex.parse(statsOf(rows), schema)
      val absent = numPool.filterNot(v => rows.exists(_._2.contains(v)))
        .filter(v => rows.flatMap(_._2) match {
          // only values OUTSIDE [min,max] are provably absent from stats
          case Nil => true
          case ns => v < ns.min || v > ns.max
        })
      Prop.all(absent.map { v =>
        val pred = GraftMorRelation.statsPredicate(EqualTo("n", v), schema).get
        (!GraftFileIndex.mayMatchFile(Seq(pred), Some(parsed))) :|
          s"out-of-range n=$v not skipped for $rows"
      }: _*)
    }
}
