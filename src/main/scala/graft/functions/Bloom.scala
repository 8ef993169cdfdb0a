package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.Shim

/** Column faces of Spark's internal Bloom-filter expressions — the
  * machinery behind runtime-filter join reduction
  * (`spark.sql.optimizer.runtime.bloomFilter.*`), which Spark does not
  * expose in the public function registry. Keys are xxhash64'd to
  * longs exactly as `InjectRuntimeFilter` does, so the sketch built
  * here is the one the optimizer itself would build.
  */
object Bloom {
  private def xx(c: Column) = new XxHash64(Seq(Shim.expression(c)))

  /** Aggregate: build a Bloom filter (as binary) over the keys. */
  def bloomFilterAgg(key: Column, estimatedItems: Long, numBits: Long): Column =
    Shim.column(new BloomFilterAggregate(xx(key),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Predicate: key possibly in the filter (never a false negative). */
  def mightContain(bloom: Column, key: Column): Column =
    Shim.column(BloomFilterMightContain(Shim.expression(bloom), xx(key)))
}
