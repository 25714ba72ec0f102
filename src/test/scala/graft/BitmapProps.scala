package graft

import graft.functions.Bitmap64
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property pins for the roaring-style bitmap: every operation must agree
  * with the Scala Set model, and serialization must be CANONICAL (a pure
  * function of the value set, whatever build/merge order produced it). */
object BitmapProps extends Properties("Bitmap64") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  // Value generator biased toward shared high-parts (same container) and
  // boundary slots, plus a sprinkle of arbitrary longs — exercises
  // array/bitset transitions and container-pair permutations.
  private val genValue: Gen[Long] = Gen.frequency(
    6 -> Gen.choose(0L, 3L).flatMap(h =>
      Gen.choose(0L, 65535L).map(s => (h << 16) | s)),
    2 -> Gen.oneOf(0L, 65535L, 65536L, -1L, -65536L,
      Long.MaxValue, Long.MinValue),
    2 -> Gen.choose(Long.MinValue, Long.MaxValue))

  private val genSet: Gen[Seq[Long]] = Gen.listOf(genValue)

  private def build(vs: Seq[Long]): Bitmap64.Bitmap = {
    val bm = Bitmap64.empty(); vs.foreach(Bitmap64.add(bm, _)); bm
  }
  private def bytes(vs: Seq[Long]): Array[Byte] =
    Bitmap64.serialize(build(vs))

  property("canonical: bytes are a pure function of the value set") =
    Prop.forAll(genSet, Gen.long) { (vs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(vs)
      java.util.Arrays.equals(bytes(vs), bytes(shuffled ++ vs.take(3)))
    }

  property("cardinality == distinct count, in memory and off the wire") =
    Prop.forAll(genSet) { vs =>
      val n = vs.distinct.size.toLong
      Bitmap64.cardinality(build(vs)) == n &&
        Bitmap64.cardinalityBytes(bytes(vs)) == n
    }

  property("merge == set union (and inputs' canonical bytes survive)") =
    Prop.forAll(genSet, genSet) { (a, b) =>
      val bb = bytes(b)
      val merged = Bitmap64.serialize(
        Bitmap64.merge(build(a), Bitmap64.deserialize(bb)))
      java.util.Arrays.equals(merged, bytes((a ++ b).distinct)) &&
        java.util.Arrays.equals(bb, bytes(b)) // other side untouched
    }

  property("and / andnot / union == Set operations") =
    Prop.forAll(genSet, genSet) { (a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      java.util.Arrays.equals(Bitmap64.andBytes(bytes(a), bytes(b)),
        bytes((sa & sb).toSeq)) &&
        java.util.Arrays.equals(Bitmap64.andNotBytes(bytes(a), bytes(b)),
          bytes((sa -- sb).toSeq)) &&
        java.util.Arrays.equals(Bitmap64.unionBytes(bytes(a), bytes(b)),
          bytes((sa | sb).toSeq))
    }

  property("contains == set membership (probing present and absent)") =
    Prop.forAll(genSet, genValue) { (vs, probe) =>
      val bs = bytes(vs)
      vs.forall(Bitmap64.containsBytes(bs, _)) &&
        Bitmap64.containsBytes(bs, probe) == vs.contains(probe)
    }

  property("round trip: deserialize(serialize) is identity on bytes") =
    Prop.forAll(genSet) { vs =>
      val bs = bytes(vs)
      java.util.Arrays.equals(
        Bitmap64.serialize(Bitmap64.deserialize(bs)), bs)
    }
}
