package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.gen.DataGen
import graft.operators.{Dedup, Enrich}

/** Property tests (SURVEY §5): join totality against the dense
  * reference table, aggregation invariants, dedup key uniqueness,
  * fingerprint determinism. Each property evaluates a Spark job, so
  * the case count is kept small. */
object GraftProps extends Properties("graft") {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val customers = DataGen.customersBatch(spark, 10000, 4).cache()

  // every generated customerID ∈ [1,10000] joins exactly one customer
  // (mirrors main.go:82 against the dense cust_id domain)
  property("enrichment join is total over the generated domain") =
    forAll(Gen.choose(50, 300)) { n =>
      val orders = DataGen.ordersBatch(spark, n, 4)
        .withColumnRenamed("orderID", "o_orderkey")
        .withColumnRenamed("customerID", "o_custkey")
        .withColumnRenamed("amount", "o_totalprice")
      val cust = customers.select(col("cust_id").cast("long").as("c_custkey"),
        col("cust_name").as("c_name"), col("city").as("c_mktsegment"))
      Enrich.enrich(orders, cust).count() == n.toLong
    }

  // Σ per-city sums == global sum
  property("grouped sums add to the global sum") =
    forAll(Gen.choose(100, 400)) { n =>
      val df = DataGen.ordersBatch(spark, n, 4)
      val global = df.agg(sum("amount")).head.getLong(0)
      val grouped = df.groupBy(pmod(col("customerID"), lit(7)))
        .agg(sum("amount").as("s")).agg(sum("s")).head.getLong(0)
      global == grouped
    }

  // generated amounts stay in the reference domain [20,499]
  property("generator respects reference domains") =
    forAll(Gen.choose(100, 500)) { n =>
      val r = DataGen.ordersBatch(spark, n, 4)
        .agg(min("amount"), max("amount"), min("customerID"), max("customerID")).head
      r.getLong(0) >= 20 && r.getLong(1) <= 499 &&
        r.getLong(2) >= 1 && r.getLong(3) <= 10000
    }

  // dedup leaves exactly one row per key, the minimum ts one
  property("first-event dedup keys are unique") =
    forAll(Gen.choose(20, 100), Gen.choose(2, 5)) { (n, users) =>
      val ev = (0 until n).map { i =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + (i * 37 % 50) * 1000L),
          (i % users).toLong, if (i % 2 == 0) "click" else "view", 1.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = Dedup.firstEventPerKey(ev)
      val keys = out.select("user_id", "event_type").distinct().count()
      out.count() == keys &&
        out.count() == ev.select("user_id", "event_type").distinct().count()
    }

  // identical texts always produce identical signatures
  property("fingerprints are deterministic functions of content") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("spark", "table", "row", "scan", "agg"))) { ws =>
      val text = ws.mkString(" ")
      val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      val fps = graft.operators.TextAnalysis.fingerprints(df)
        .select("fp_md5", "fp_roll").as[(String, Long)].collect()
      fps(0) == fps(1)
    }

  // the blocked distributed scorer agrees with a naive driver-side
  // computation on arbitrary small vector sets, at every block count
  property("blocked cosine top-k pairs equal the naive answer") =
    forAll(Gen.choose(3, 12), Gen.choose(1, 6), Gen.choose(1L, 999L)) { (n, blocks, seed) =>
      val vecs = (0 until n).map { i =>
        val r = new scala.util.Random(seed * 31 + i)
        (i.toLong, Seq.fill(4)(r.nextFloat()), 0)
      }.toDF("vec_id", "embedding", "label")
      val got = graft.operators.Similarity.cosinePairsTopK(vecs, k = 3, nBlocks = blocks)
        .as[(Long, Long, Double)].collect().toSeq
      val vv = vecs.select("vec_id", "embedding")
        .as[(Long, Seq[Float])].collect().map { case (id, e) =>
          (id, e.map(_.toDouble).toArray)
        }
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        BigDecimal(d / (na * nb))
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val naive = (for {
        (a, av) <- vv; (b, bv) <- vv if a < b
      } yield (a, b, cos(av, bv)))
        .sortBy { case (a, b, c) => (-c, a, b) }.take(3).toSeq
      got == naive
    }

  // the banded+certified simhash pipeline equals blocked exact all-pairs
  // for every band count that divides 60
  property("banded simhash candidates equal exact all-pairs") =
    forAll(Gen.oneOf(2, 3, 4, 6), Gen.choose(1L, 999L)) { (bands, seed) =>
      val words = Seq("a", "b", "c", "d", "e", "f", "g", "h")
      val r = new scala.util.Random(seed)
      val d = (0 until 10).map { i =>
        (i.toLong, Seq.fill(6)(words(r.nextInt(words.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val banded = Dedup.simhashTopK(d, k = 5, bands = bands)
        .as[(Long, Long, Long)].collect().toSeq
      val exact = Dedup.simhashAllPairsTopK(d, k = 5)
        .as[(Long, Long, Long)].collect().toSeq
      banded == exact
    }

  // hash-split assignment is a pure function of the key: any subset of
  // the corpus assigns identically to the full corpus
  property("hash split is consistent under subsetting") =
    forAll(Gen.choose(5, 30), Gen.choose(1L, 999L)) { (n, seed) =>
      val docs = (0 until n).map(i => (seed * 100 + i, "t", "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val full = graft.operators.Sampling.sampleSplit(docs)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      val half = graft.operators.Sampling.sampleSplit(docs.filter(col("doc_id") % 2 === 0))
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      half.forall { case (id, s) => full(id) == s }
    }

  private val wordGen = Gen.oneOf("the", "a", "fast", "table", "row", "scan", "value")
  private val textGen = Gen.chooseNum(1, 30)
    .flatMap(k => Gen.listOfN(k, wordGen)).map(_.mkString(" "))

  // the distributed prefix-sum selection equals the local greedy on any
  // corpus and any budget — the scale machinery must never change WHAT
  // is selected, only WHERE it is computed
  property("budget select equals the local greedy") =
    forAll(Gen.chooseNum(2, 25), Gen.chooseNum(5L, 300L), Gen.long) { (n, budget, seed) =>
      val texts = (0 until n).map { i =>
        val g = textGen(Gen.Parameters.default.withSize(10),
          org.scalacheck.rng.Seed(seed + i)).getOrElse("the a")
        (i.toLong, g, "en", "s", g.length.toLong)
      }
      val docs = texts.toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = graft.operators.Sampling.budgetSelect(docs, budget)
        .select("doc_id").as[Long].collect().toSet
      // local greedy: admit while cumulative-before < budget
      var cum = 0L
      val keep = scala.collection.mutable.Set.empty[Long]
      graft.operators.TextAnalysis.qualityScore(docs, extraCols = Seq("n_tokens"))
        .select(col("doc_id"), col("quality"), col("n_tokens"))
        .as[(Long, Double, Long)].collect()
        .sortBy { case (id, q, _) => (-q, id) }
        .foreach { case (id, _, t) => if (cum < budget) keep += id; cum += t }
      got == keep.toSet
    }

  // fixpoint label propagation equals a local union-find over the SAME
  // edge set — the connected-components engine behind the whole x4
  // clustering family must match textbook semantics on any graph
  property("fixpoint clustering equals local union-find") =
    forAll(Gen.chooseNum(2, 25), Gen.chooseNum(0, 40), Gen.long) { (n, m, seed) =>
      val rnd = new scala.util.Random(seed)
      val edges = (0 until m).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val nodes = (0 until n).map(_.toLong)
      val nodesDf = nodes.toDF("doc_id")
      val pairsDf = edges.toDF("doc_a", "doc_b")
      val got = graft.operators.Dedup.clusterEdgesFixpoint(nodesDf, pairsDf)
        .as[(Long, Long)].collect().toMap
      // local union-find with path compression; canonical label =
      // min member id, the operator's documented contract
      val parent = scala.collection.mutable.Map(nodes.map(i => i -> i): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = nodes.map(i => i -> find(i)).toMap
      got == want
    }

  // the distributed unigram scorer equals the local brute force on any
  // corpus — distinct-pair collapse, vocabulary join, and micro-nat
  // arithmetic must never change the VALUE, only the plan
  property("unigram log-prob equals the local brute force") =
    forAll(Gen.chooseNum(2, 20), Gen.long) { (n, seed) =>
      val texts = (0 until n).map { i =>
        val g = textGen(Gen.Parameters.default.withSize(10),
          org.scalacheck.rng.Seed(seed + i)).getOrElse("the a")
        (i.toLong, g)
      }
      val docs = texts.toDF("doc_id", "text")
      val got = graft.operators.TextAnalysis.unigramLogProb(docs)
        .as[(Long, Long, Double)].collect().sortBy(_._1).toList
      val all = texts.flatMap(_._2.split(" "))
      val cnt = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = all.size.toLong
      def lp6(tok: String): Long =
        math.floor(math.log(cnt(tok).toDouble / total) * 1e6 + 0.5).toLong
      val want = texts.map { case (id, text) =>
        val toks = text.split(" ").toSeq
        val micro = toks.map(lp6).sum
        (id, toks.size.toLong, micro.toDouble / (toks.size.toDouble * 1e6))
      }.toList
      got == want
    }

  // redaction counts every planted class; the redacted text has no
  // residual match (completeness) and a second pass is the identity
  // (idempotence) — verified against the operator's own md5 output
  property("pii redaction is idempotent and complete") =
    forAll(Gen.chooseNum(1, 10), Gen.long) { (n, seed) =>
      import graft.operators.TextAnalysis.piiPatterns
      val raw = (0 until n).map { i =>
        val base = textGen(Gen.Parameters.default.withSize(8),
          org.scalacheck.rng.Seed(seed + i)).getOrElse("the a")
        (i.toLong, base + s" u$i@x$i.org 555-000$i 10.0.$i.1", "en", "s", 0L)
      }
      val docs = raw.toDF("doc_id", "text", "lang", "source", "n_chars")
      val once = graft.operators.TextAnalysis.piiRedact(docs)
        .select("doc_id", "n_emails", "n_phones", "n_ips", "clean_md5")
        .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
      val clean = raw.map { case (id, text, _, _, _) =>
        id -> piiPatterns.foldLeft(text) { case (s, (_, pat, repl)) =>
          s.replaceAll(pat, repl)
        }
      }.toMap
      once.forall { case (id, e, p, ip, md) =>
        val c = clean(id)
        e >= 1 && p >= 1 && ip >= 1 &&
          // operator md5 equals the reference sequential redaction
          md == java.security.MessageDigest.getInstance("MD5")
            .digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString &&
          // completeness: nothing left for any pattern to match
          piiPatterns.forall { case (_, pat, _) => pat.r.findFirstIn(c).isEmpty } &&
          // idempotence: redacting the clean text changes nothing
          piiPatterns.foldLeft(c) { case (s, (_, pat, repl)) =>
            s.replaceAll(pat, repl)
          } == c
      }
    }

  // the Bloom guarantee under arbitrary corpora: an incoming text that
  // IS in the index is never missed, whatever the collision pattern
  property("bloom gate never false-negatives") =
    forAll(Gen.nonEmptyListOf(textGen), Gen.nonEmptyListOf(textGen)) {
      (idxTexts, newTexts) =>
        val idx = idxTexts.zipWithIndex
          .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
        // incoming = every index text (forced dups) + the fresh ones
        val inc = (idxTexts ++ newTexts).zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val idxSet = idxTexts.toSet
        graft.operators.Dedup.bloomGate(inc, idx)
          .as[(Long, String, Boolean, Boolean)].collect()
          .forall { case (id, _, hit, dup) =>
            val isDup = idxSet.contains((idxTexts ++ newTexts)(id.toInt))
            dup == isDup && (!isDup || hit)
          }
    }

  // SQ int8 reconstruction: every element decodes to within half a
  // scale step of the original, on arbitrary vectors
  property("SQ encode reconstructs within scale/2 per element") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-10.0f, 10.0f))) { vs =>
      val e = Seq((0L, vs, 0)).toDF("vec_id", "embedding", "label")
      val (scale, q) = graft.operators.Similarity.sqCodes(e)
        .as[(Long, Double, Seq[Double])].map(r => (r._2, r._3)).head()
      q.zip(vs).forall { case (qi, v) =>
        math.abs(qi) <= 127.0 &&
          math.abs(qi * scale - v.toDouble) <= scale / 2 + 1e-12
      }
    }

  // binary sign words: the Hamming distance of two packed vectors is
  // exactly the number of dimensions whose sign classification differs
  property("sign-pack Hamming equals the sign-disagreement count") =
    forAll(Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f)),
           Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f))) { (a, b) =>
      val e = Seq((0L, a, 0), (1L, b, 0)).toDF("vec_id", "embedding", "label")
      val c = graft.operators.Similarity.binaryCodes(e)
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val ham = java.lang.Long.bitCount(c(0)._2 ^ c(1)._2) +
        java.lang.Long.bitCount(c(0)._3 ^ c(1)._3)
      val expect = a.zip(b).count { case (x, y) => (x > 0) != (y > 0) }
      ham == expect
    }

  // histogram sketch merge law on arbitrary shard cuts: sum-merged
  // shard sketches equal the whole-corpus sketch exactly
  property("histogram shard sketches sum-merge to the corpus sketch") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0.0, 100.0)), Gen.choose(2, 4)) {
      (vals, shards) =>
        val rows = vals.zipWithIndex.map { case (v, i) =>
          (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"),
            i.toLong % 3, "t" + (i % 2), v)
        }.toDF("event_id", "ts", "user_id", "event_type", "value")
        val whole = graft.operators.Profiling.histSketch(rows)
          .as[(String, Long, Long)].collect().toSet
        val parts = (0 until shards).map(s =>
          graft.operators.Profiling.histSketch(
            rows.filter(col("event_id") % shards === s)))
        val merged = graft.operators.Profiling.histMerge(parts: _*)
          .as[(String, Long, Long)].collect().toSet
        merged == whole
    }

  // CMS point estimates dominate exact counts for EVERY key, not just
  // the audited top-k, on arbitrary corpora
  property("CMS never undercounts any token") =
    forAll(Gen.nonEmptyListOf(textGen)) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val exact = texts.flatMap(_.split(" ")).groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      val sketch = graft.operators.Profiling.cmsSketch(docs)
      graft.operators.Profiling
        .cmsEstimateAgainst(exact.keys.toSeq.toDF("token"), sketch)
        .as[(String, Long)].collect()
        .forall { case (tok, est) => est >= exact(tok) }
    }
}
