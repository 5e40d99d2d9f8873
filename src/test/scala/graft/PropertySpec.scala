package graft

import graft.clustering.SparkTestSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks over the hash/signature operators using
  * scalacheck generators with a FIXED seed (deterministic CI). All
  * cases for a property are batched into one DataFrame pass, so
  * dozens of generated inputs cost a single Spark job.
  */
class PropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
  private val sentence = Gen.nonEmptyListOf(word).map(_.take(30).mkString(" "))

  test("minhash signatures are invariant under word permutation and duplication") {
    val texts = sample(Gen.listOfN(60, sentence), 11L)
    val rng = new scala.util.Random(7)
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      val shuffled = (rng.shuffle(t.split(" ").toList) ++ t.split(" ").take(2)).mkString(" ")
      Seq((i.toLong * 2, t), (i.toLong * 2 + 1, shuffled))
    }
    val sig = dedup.Dedup.signatures(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    texts.indices.foreach { i =>
      assert(sig(i.toLong * 2) == sig(i.toLong * 2 + 1),
        s"signature changed under permutation for doc $i")
    }
  }

  test("hamming is a metric on generated bitstrings: bounds, symmetry, triangle") {
    val bits = Gen.listOfN(16, Gen.oneOf('0', '1')).map(_.mkString)
    val triples = sample(Gen.listOfN(80, Gen.zip(bits, bits, bits)), 13L)
    val df = triples.toDF("a", "b", "c")
    import graft.functions.GraftFunctions.hamming
    val out = df.select(
      hamming($"a", $"b").as("ab"), hamming($"b", $"a").as("ba"),
      hamming($"a", $"c").as("ac"), hamming($"c", $"b").as("cb"),
      hamming($"a", $"a").as("aa")).collect()
    out.foreach { r =>
      val (ab, ba, ac, cb, aa) =
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(aa == 0, "identity")
      assert(ab == ba, "symmetry")
      assert(ab >= 0 && ab <= 16, "bounds")
      assert(ab <= ac + cb, "triangle inequality")
    }
  }

  test("simhash fingerprints are word-multiset-order invariant") {
    val texts = sample(Gen.listOfN(40, sentence), 17L)
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      val doubled = (t.split(" ") ++ t.split(" ").reverse).mkString(" ")
      Seq((i.toLong * 2, t), (i.toLong * 2 + 1, doubled))
    }
    val fp = dedup.Dedup.simhashOf(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.indices.foreach { i =>
      assert(fp(i.toLong * 2) == fp(i.toLong * 2 + 1), s"simhash changed for doc $i")
    }
  }
}
