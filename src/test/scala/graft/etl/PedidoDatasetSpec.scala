package graft.etl

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Encoders

/** Drift guard + round-trip for the typed fat-table surface. */
class PedidoDatasetSpec extends SparkSpec {

  test("Pedido encoder mirrors fatSchema field-for-field") {
    val enc = Encoders.product[Pedido].schema
    assert(enc.fieldNames.toSeq == Schemas.fatSchema.fieldNames.toSeq)
    // types must agree up to nullability; DecimalType precision comes from
    // the DataFrame side on as[Pedido], so BigDecimal fields only need to
    // BE decimals here
    enc.fields.zip(Schemas.fatSchema.fields).foreach { case (e, f) =>
      assert(e.dataType.typeName.takeWhile(_ != '(') ==
        f.dataType.typeName.takeWhile(_ != '('),
        s"${f.name}: encoder ${e.dataType} vs schema ${f.dataType}")
    }
  }

  test("entry DW rows round-trip through Dataset[Pedido] with typed access") {
    val ds = Pedido.typed(SparkEntry.entry(spark))
    val rows = ds.collect()
    assert(rows.nonEmpty)
    // typed field access (compile-time checked) agrees with the DataFrame
    val viaDf = SparkEntry.entry(spark)
      .selectExpr("max(chave_nfe)").head.getString(0)
    assert(rows.map(_.chave_nfe).max == viaDf)
    // typed transformations stay typed
    val ufs = ds.filter(_.uf != null).map(_.uf)(Encoders.STRING)
      .distinct().collect().toSet
    assert(ufs.subsetOf(Set("SP", "RJ")))
  }
}
