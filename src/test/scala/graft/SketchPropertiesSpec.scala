package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{MisraGriesCandidates, WeightedPercentileApprox}

/** ScalaCheck properties over the round-10 sketch buffers — pure JVM
  * state, so the GK ε-rank bound and the MG superset guarantee are
  * checked directly on randomized weighted streams, across random
  * partition splits and a serialization round-trip (the exact code
  * paths a distributed aggregation exercises).
  */
object SketchProperties extends Properties("sketches") {

  private val weightedStream: Gen[List[(Double, Long)]] = for {
    n <- Gen.choose(50, 400)
    vs <- Gen.listOfN(n, Gen.zip(
      Gen.choose(-1000.0, 1000.0), Gen.choose(1L, 40L)))
  } yield vs

  private def splitMerge(pairs: List[(Double, Long)], parts: Int,
                         eps: Double): WeightedPercentileApprox.Buffer = {
    val groups = pairs.zipWithIndex.groupBy(_._2 % parts).values.toList
    val bufs = groups.map { g =>
      val b = new WeightedPercentileApprox.Buffer(eps)
      g.foreach { case ((v, w), _) => b.add(v, w) }
      b
    }
    val acc = bufs.head
    bufs.tail.foreach(acc.mergeWith)
    // serde round-trip: what the shuffle does between partial and merge
    WeightedPercentileApprox.Buffer.fromBytes(acc.toBytes)
  }

  property("weighted GK: estimate within 2ε·N weighted rank of exact") =
    forAll(weightedStream, Gen.choose(0.05, 0.95), Gen.choose(1, 7)) {
      (pairs, p, parts) =>
        val eps = 1e-3
        val buf = splitMerge(pairs, parts, eps)
        val got = buf.query(Seq(p)).get.head
        // exact weighted rank interval of the returned value
        val sorted = pairs.groupBy(_._1).view
          .mapValues(_.map(_._2).sum).toList.sortBy(_._1)
        val total = sorted.map(_._2).sum
        val before = sorted.takeWhile(_._1 < got).map(_._2).sum
        val through = before +
          sorted.find(_._1 == got).map(_._2).getOrElse(0L)
        val target = math.ceil(p * total).toLong
        val slack = math.max(1L, math.ceil(2 * eps * total).toLong)
        through >= target - slack && before <= target + slack
    }

  property("weighted GK: histogram feed ≡ expanded unit-weight feed") =
    forAll(weightedStream, Gen.choose(0.05, 0.95)) { (pairs, p) =>
      val eps = 1e-3
      val hist = new WeightedPercentileApprox.Buffer(eps)
      pairs.foreach { case (v, w) => hist.add(v, w) }
      val unit = new WeightedPercentileApprox.Buffer(eps)
      pairs.foreach { case (v, w) =>
        var i = 0L; while (i < w) { unit.add(v, 1L); i += 1 }
      }
      // both are ε-accurate; their answers agree within 4ε·N rank —
      // check via each other's rank interval rather than equality
      val total = pairs.map(_._2).sum
      val a = hist.query(Seq(p)).get.head
      val b = unit.query(Seq(p)).get.head
      val sorted = pairs.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toList.sortBy(_._1)
      def rankThrough(v: Double): Long =
        sorted.takeWhile(_._1 <= v).map(_._2).sum
      math.abs(rankThrough(a) - rankThrough(b)) <=
        math.max(2L, math.ceil(4 * eps * total).toLong)
    }

  private val itemStream: Gen[List[String]] = for {
    nHeavy <- Gen.choose(1, 4)
    heavyReps <- Gen.choose(60, 200)
    nRare <- Gen.choose(50, 300)
    shuffleSeed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val heavy = (0 until nHeavy).flatMap(h => List.fill(heavyReps)(s"H$h"))
    val rare = (0 until nRare).map(i => s"r$i")
    new scala.util.Random(shuffleSeed).shuffle((heavy ++ rare).toList)
  }

  property("MG: every item with freq > N/(k+1) survives any partitioning") =
    forAll(itemStream, Gen.choose(8, 40), Gen.choose(1, 7)) {
      (items, k, parts) =>
        val groups = items.zipWithIndex.groupBy(_._2 % parts).values.toList
        val bufs = groups.map { g =>
          val b = new MisraGriesCandidates.Buffer(k)
          g.foreach { case (it, _) => b.add(it, 1L) }
          b
        }
        val acc = bufs.head
        bufs.tail.foreach(acc.mergeWith)
        val merged = MisraGriesCandidates.Buffer.fromBytes(acc.toBytes)
        val cands = merged.candidates.toSet
        val n = items.size
        val freq = items.groupBy(identity).view.mapValues(_.size).toMap
        val mustSurvive = freq.filter(_._2 > n / (k + 1)).keySet
        cands.size <= k && mustSurvive.subsetOf(cands)
    }

  property("CM: never underestimates and conserves mass, any partitioning") =
    forAll(itemStream, Gen.choose(2, 5), Gen.oneOf(31, 97, 1021),
      Gen.choose(1, 7)) { (items, d, w, parts) =>
      import graft.functions.CountMinSketchAgg.{bucket, hashPair}
      // partition-local cells merged by vector add — the exact shuffle
      // path the distributed aggregation exercises
      val groups = items.zipWithIndex.groupBy(_._2 % parts).values.toList
      val cells = new Array[Long](d * w)
      groups.foreach { g =>
        val local = new Array[Long](d * w)
        g.foreach { case (it, _) =>
          val (h1, h2) = hashPair(it.getBytes("UTF-8"))
          (0 until d).foreach(r => local(r * w + bucket(h1, h2, r, w)) += 1)
        }
        (0 until cells.length).foreach(i => cells(i) += local(i))
      }
      val n = items.size.toLong
      val freq = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val massOk = (0 until d).forall(r =>
        cells.slice(r * w, (r + 1) * w).sum == n)
      val oneSided = freq.forall { case (it, f) =>
        val (h1, h2) = hashPair(it.getBytes("UTF-8"))
        (0 until d).map(r => cells(r * w + bucket(h1, h2, r, w))).min >= f
      }
      massOk && oneSided
    }
}
