package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed row of the DW fat table — a field-for-field mirror of
  * [[Schemas.fatSchema]] (sql/ddl_fat_pedidos via SURVEY §1.3), giving the
  * gold layer a compile-time-checked `Dataset[Pedido]` surface where the
  * bronze/silver layers stay `DataFrame` (their schemas are dynamic by
  * design: inferred headers, DE_PARA drift). Nullable numerics use boxed
  * types — a Scala `Int`/`BigDecimal` primitive field would NPE on the
  * NULLs the merge legitimately produces. PedidoDatasetSpec pins the
  * encoder's schema against fatSchema so the mirror cannot drift. */
final case class Pedido(
    id: String,
    data_insercao: java.sql.Timestamp,
    tipo_entrega: String,
    pedido: String,
    data_nfe: java.sql.Date,
    serie_nfe: String,
    numero_nfe: String,
    valor_nfe: java.math.BigDecimal,
    qtd_volumes: java.lang.Integer,
    peso: java.math.BigDecimal,
    remessa: String,
    nome_destinatario: String,
    endereco_completo: String,
    cep: String,
    cod_cd: java.lang.Integer,
    cd: String,
    cnpj_cpf_transportadora: String,
    transportador: String,
    lead_time: String,
    data_prev_entrega: java.sql.Date,
    status_prazo: String,
    id_ult_ocr: String,
    ultima_ocorrencia: String,
    chave_ult_ocr: String,
    data_ultima_ocr: java.sql.Timestamp,
    agrupador: String,
    endereco: String,
    numero: String,
    bairro: String,
    cidades: String,
    uf: String,
    etiquetas: String,
    chegada_transportadora: java.sql.Timestamp,
    cod_vendedor: String,
    chave_nfe: String,
    qtd_itens: String,
    data_prev_entrega_original: java.sql.Date,
    cpf_destinatario: String,
    grau_risco: String,
    tipo_operacao: String,
    arquivo_origem: String)

object Pedido {

  /** Typed view of a fat-table DataFrame. `as[Pedido]` is a zero-copy
    * analysis-time cast — Catalyst checks names and types up front, so a
    * schema mismatch fails at planning, not mid-job. */
  def typed(df: DataFrame): Dataset[Pedido] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[Pedido]
  }
}
