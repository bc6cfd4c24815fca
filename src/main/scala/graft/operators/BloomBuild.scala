package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Aggregator

import graft.expressions.KernelOps

/** Bloom-filter construction as a mergeable aggregate: insert each 64-bit
  * key into a fixed [[KernelOps.BloomBytes]]-size bit array; merge = OR.
  * Paired with the codegen'd [[graft.expressions.NativeKernels
  * .bloomMightContain]] probe, this is the "ship a filter, not the set"
  * decontamination device (q228): the membership side crosses the cluster
  * as ONE 64 KiB row however many keys it holds, while the exact gram
  * relation would grow with the benchmark suite.
  *
  * Spark's own `bloom_filter_agg`/`might_contain` pair exists only inside
  * the optimizer's runtime-filter injection (exercised by q77) — it is not
  * callable surface, which is what puts this Aggregator under SURVEY §2.11's
  * "no built-in" policy next to [[SignatureMin]]. Partial aggregation and
  * merge come from the Aggregator contract: the shuffle carries one
  * fixed-size buffer per partition, never a key.
  */
object BloomBuild extends Aggregator[Long, Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = new Array[Byte](KernelOps.BloomBytes)

  override def reduce(bits: Array[Byte], key: Long): Array[Byte] = {
    KernelOps.bloomInsert(bits, key)
    bits
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
    x
  }

  override def finish(bits: Array[Byte]): Array[Byte] = bits

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
