package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("token pagerank: damped integer power iteration on a 3-node chain") {
    // graph a -> b -> c (each bigram appears 3 times to clear the
    // min-count bar). Hand-computed micro-unit ranks after 3 rounds:
    //   r1: a 150000, b 1000000, c 1000000
    //   r2: a 150000, b  277500 (150000 + (150000*51)//60), c 1000000
    //   r3: a 150000, b  277500, c 385875 (150000 + (277500*51)//60)
    val docs = Seq("a b", "a b", "a b", "b c", "b c", "b c")
      .toDF("text")
    val got = Graph.tokenPageRank(docs, minEdgeCount = 3L, iters = 3, k = 10)
      .as[(String, Double)].collect().toSeq
    assert(got === Seq(("c", 0.385875), ("b", 0.2775), ("a", 0.15)))
  }

  test("token pagerank: below-min-count edges are pruned from the graph") {
    val docs = Seq("a b", "a b", "a b", "x y").toDF("text")
    val got = Graph.tokenPageRank(docs, minEdgeCount = 3L, iters = 1, k = 10)
      .as[(String, Double)].collect().toMap
    // x/y never enter the node set; a keeps only the teleport mass
    assert(got.keySet === Set("a", "b"))
    assert(got("a") === 0.15)
    assert(got("b") === 1.0) // 150000 + (1000000*3*17)//(3*20) = 1000000
  }
}
