package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{Float8Vector, TimeStampNanoVector, TimeStampVector, VectorSchemaRoot}
import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Feather-v2 whole-series blob wire parity (SURVEY §2.10 optional
  * tier): the reference's whole-series store persists each series as a
  * one-column pandas DataFrame serialized with
  * `df.to_feather(buf, compression='lz4')`
  * (hostore/models/hostore.py:347-353). Feather v2 IS the Arrow IPC
  * *file* format ("ARROW1" magic) with record-batch buffers compressed
  * as LZ4 frames, so these expressions speak it natively through the
  * arrow-java jars Spark already ships:
  *
  *  - [[FeatherEncode]]: (series name, array<struct<ts,value>>) -> blob.
  *    Layout is the reference's explicitly-supported legacy shape — an
  *    `index` timestamp[ns] column plus one float64 column named after
  *    the series (`df.reset_index(names=['index'])`,
  *    hostore.py:349-351); the reference read path detects the `index`
  *    column and restores it (`set_index('index')`, hostore.py:250-252),
  *    so `pd.read_feather` on our bytes yields the reference's exact
  *    DataFrame. NaN values are written as Arrow nulls — byte parity
  *    with pyarrow's `from_pandas` NaN handling.
  *  - [[FeatherDecode]]: blob -> struct<name, points>. Reads both index
  *    layouts the reference can emit (legacy `index` column and modern
  *    `__index_level_0__` pandas-metadata serialization), any timestamp
  *    unit, multi-batch files; Arrow nulls come back as NaN exactly like
  *    `pd.read_feather` into a float64 series.
  *
  * Timestamps cross the wire as naive nanoseconds and land as
  * TimestampNTZ micros — the store's UTC-NTZ discipline (SURVEY F3).
  * Codec work on a whole blob is branchy byte I/O, so both are eval-only
  * expressions (CodegenFallback) sitting in import/export projections,
  * never in hot analytic loops.
  */
object FeatherBlob {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}

  private[functions] val PointType: StructType = StructType(Seq(
    StructField("ts", TimestampNTZType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val DecodedType: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("points", ArrayType(PointType, containsNull = false), nullable = false)))

  def feather_encode(name: Column, points: Column): Column =
    toColumn(FeatherEncode(toExpr(name), toExpr(points)))
  def feather_decode(blob: Column): Column = toColumn(FeatherDecode(toExpr(blob)))

  private[functions] def toMicros(unit: ArrowTimeUnit, v: Long): Long = unit match {
    case ArrowTimeUnit.SECOND      => Math.multiplyExact(v, 1000000L)
    case ArrowTimeUnit.MILLISECOND => Math.multiplyExact(v, 1000L)
    case ArrowTimeUnit.MICROSECOND => v
    case ArrowTimeUnit.NANOSECOND  => Math.floorDiv(v, 1000L)
  }
}

case class FeatherEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(s: StructType, _))
        if s.length == 2 && s(0).dataType == TimestampNTZType && s(1).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"feather_encode expects (string, array<struct<ts: timestamp_ntz, value: double>>), got ($l, $r)")
  }

  override def nullSafeEval(nameAny: Any, pointsAny: Any): Any = {
    val name = nameAny.asInstanceOf[UTF8String].toString
    val points = pointsAny.asInstanceOf[ArrayData]
    val n = points.numElements()
    val allocator = new RootAllocator()
    try {
      val fields = List(
        new Field("index",
          FieldType.notNullable(new ArrowType.Timestamp(ArrowTimeUnit.NANOSECOND, null)), null),
        new Field(name,
          FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null))
      val root = VectorSchemaRoot.create(new Schema(fields.asJava), allocator)
      try {
        val idxVec = root.getVector(0).asInstanceOf[TimeStampNanoVector]
        val valVec = root.getVector(1).asInstanceOf[Float8Vector]
        idxVec.allocateNew(n)
        valVec.allocateNew(n)
        var i = 0
        while (i < n) {
          require(!points.isNullAt(i), s"feather_encode: null point struct at position $i")
          val row = points.getStruct(i, 2)
          require(!row.isNullAt(0), s"feather_encode: null ts at position $i")
          idxVec.set(i, Math.multiplyExact(row.getLong(0), 1000L))
          // NaN -> Arrow null: the exact wire form pyarrow's from_pandas
          // gives a pandas float64 series with holes
          val v = if (row.isNullAt(1)) Double.NaN else row.getDouble(1)
          if (v.isNaN) valVec.setNull(i) else valVec.set(i, v)
          i += 1
        }
        root.setRowCount(n)
        val bos = new java.io.ByteArrayOutputStream(n * 12 + 512)
        val writer = new ArrowFileWriter(
          root, null, java.nio.channels.Channels.newChannel(bos),
          null, org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
          CommonsCompressionFactory.INSTANCE, CompressionUtil.CodecType.LZ4_FRAME)
        try {
          writer.start(); writer.writeBatch(); writer.end()
        } finally writer.close()
        bos.toByteArray
      } finally root.close()
    } finally allocator.close()
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class FeatherDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = FeatherBlob.DecodedType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"feather_decode expects binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val allocator = new RootAllocator()
    try {
      val reader = new ArrowFileReader(
        new ByteArrayReadableSeekableByteChannel(bytes), allocator,
        CommonsCompressionFactory.INSTANCE)
      try {
        val root = reader.getVectorSchemaRoot
        val schema = root.getSchema
        val fields = schema.getFields.asScala.toList
        // index column: the legacy explicit name, the pandas serialized
        // index, else any timestamp-typed column (hostore.py:250-252)
        val idxPos = fields.indexWhere(f => f.getName == "index" || f.getName == "__index_level_0__") match {
          case -1 => fields.indexWhere(_.getType.isInstanceOf[ArrowType.Timestamp])
          case p  => p
        }
        require(idxPos >= 0, "feather_decode: no timestamp index column in blob")
        val valPos = fields.indices.find(_ != idxPos).getOrElse(
          throw new IllegalArgumentException("feather_decode: no value column in blob"))
        val unit = fields(idxPos).getType.asInstanceOf[ArrowType.Timestamp].getUnit
        val name = fields(valPos).getName
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        while (reader.loadNextBatch()) {
          val idxVec = root.getVector(idxPos).asInstanceOf[TimeStampVector]
          val valVec = root.getVector(valPos).asInstanceOf[Float8Vector]
          var i = 0
          val n = root.getRowCount
          while (i < n) {
            require(!idxVec.isNull(i), s"feather_decode: null index at position $i")
            val ts = FeatherBlob.toMicros(unit, idxVec.get(i))
            // Arrow null -> NaN, like pd.read_feather into float64
            val v = if (valVec.isNull(i)) Double.NaN else valVec.get(i)
            out += InternalRow(ts, v)
            i += 1
          }
        }
        InternalRow(UTF8String.fromString(name), new GenericArrayData(out.toArray[Any]))
      } finally reader.close()
    } finally allocator.close()
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
