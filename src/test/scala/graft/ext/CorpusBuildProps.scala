package graft.ext

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property-based fuzz of the one-call corpus build: for ARBITRARY
  * small corpora (random texts, injected exact and near duplicates),
  * the admitted set must satisfy the build's contracts, checked by
  * independent brute force on the driver.
  */
object CorpusBuildProps extends Properties("corpusBuild") {

  // few, larger cases: each case runs real Spark jobs
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.core.Sessions.local("corpus-props", 4)

  private val words: Seq[String] =
    Seq("the", "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi",
      "rho", "sigma", "tau")

  private val genDoc: Gen[Seq[String]] = for {
    n <- Gen.choose(22, 40) // inside the 20..80 gate
    toks <- Gen.listOfN(n - 1, Gen.oneOf(words))
  } yield "the" +: toks // guarantee the stopword gate

  private case class Corpus(rows: Seq[(Long, String, String)])

  private val genCorpus: Gen[Corpus] = for {
    n <- Gen.choose(6, 14)
    base <- Gen.listOfN(n, genDoc)
    // duplicate injections: (target, source, exact?) — target copies
    // source's text (exact) or mutates one token (near)
    dups <- Gen.listOf(for {
      i <- Gen.choose(0, n - 1); j <- Gen.choose(0, n - 1)
      exact <- Gen.oneOf(true, false)
    } yield (i, j, exact)).map(_.take(4))
  } yield {
    val texts = base.map(_.toArray).toArray
    dups.foreach { case (i, j, exact) =>
      if (i != j) {
        texts(math.max(i, j)) =
          if (exact) texts(math.min(i, j)).clone()
          else texts(math.min(i, j)).updated(1, "MUTANT")
      }
    }
    Corpus(texts.zipWithIndex.map { case (t, k) =>
      (k.toLong, s"src${k % 2}", t.mkString(" "))
    }.toIndexedSeq)
  }

  private def shingles(text: String): Set[Seq[String]] =
    text.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
      .map(_.toSeq).toSet

  property("admitted set: gate-passing keepers, near-dup-free, deterministic") =
    Prop.forAll(genCorpus) { c =>
      import spark.implicits._
      val df = c.rows.toDF("doc_id", "source", "text")
      def build() = CorpusBuild.run(df,
        java.nio.file.Files.createTempDirectory("cb-prop").toString)
        .read().collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pack_id"),
          r.getSeq[Long](r.fieldIndex("token_ids")).toList))
        .sortBy(_._1)
      val run1 = build()
      val admitted = run1.map(_._1).toSet
      val byId = c.rows.map(r => r._1 -> r._3).toMap

      val deterministic = run1.toSeq == build().toSeq
      // exact-dup: the smaller id of any identical-text pair wins
      val keeperLaw = c.rows.forall { case (id, _, text) =>
        !admitted(id) || !c.rows.exists { case (id2, _, t2) =>
          id2 < id && t2.trim == text.trim }
      }
      // near-dup: no two admitted docs with shingle Jaccard >= 1/2
      val pairsOk = admitted.toSeq.combinations(2).forall { case Seq(a, b) =>
        val (sa, sb) = (shingles(byId(a)), shingles(byId(b)))
        sa.isEmpty || sb.isEmpty ||
          3 * sa.intersect(sb).size < sa.size + sb.size
      }
      // every admitted doc decodes to its own length
      val lengthsOk = run1.forall { case (id, _, tids) =>
        tids.length == byId(id).split(" ").count(_.nonEmpty)
      }
      deterministic :| "deterministic" &&
        keeperLaw :| "exact-dup keeper law" &&
        pairsOk :| "no admitted near-dup pair" &&
        lengthsOk :| "token arrays complete"
    }
}
