package graft.etl

import org.apache.spark.sql.types._

/** Canonical schemas and header mappings for the pedidos (NFe order) domain.
  *
  * Semantics derived from the reference repo (levialmeidaz/sftp-data-ingestion):
  *  - canonical column order: /root/reference/python/02_load_stage_pedidos.py:39-47
  *  - header→snake_case map (DE_PARA): python/02_load_stage_pedidos.py:49-92
  *  - staging DDL (all VARCHAR): sql/ddl_stg_pedidos:2-42
  *  - DW fact DDL (typed): sql/ddl_fat_pedidos:2-42
  *  - history DDL (audit cols + staging strings): sql/ddl_hist_pedidos:6-53
  */
object Schemas {

  /** Fixed 41-column destination order (40 data + lineage), matching
    * COLUNAS_DESTINO at 02_load_stage_pedidos.py:39-47. */
  val colunasDestino: Seq[String] = Seq(
    "id", "data_insercao", "tipo_entrega", "pedido", "data_nfe", "serie_nfe",
    "numero_nfe", "valor_nfe", "qtd_volumes", "peso", "remessa",
    "nome_destinatario", "endereco_completo", "cep", "cod_cd", "cd",
    "cnpj_cpf_transportadora", "transportador", "lead_time",
    "data_prev_entrega", "status_prazo", "id_ult_ocr", "ultima_ocorrencia",
    "chave_ult_ocr", "data_ultima_ocr", "agrupador", "endereco", "numero",
    "bairro", "cidades", "uf", "etiquetas", "chegada_transportadora",
    "cod_vendedor", "chave_nfe", "qtd_itens", "data_prev_entrega_original",
    "cpf_destinatario", "grau_risco", "tipo_operacao", "arquivo_origem")

  /** Original-report header → canonical snake_case. Mirrors DE_PARA
    * (02_load_stage_pedidos.py:49-92) including the three accepted spelling
    * variants of "Data Prev. Entrega Original" (:86-88). */
  val dePara: Map[String, String] = Map(
    "ID" -> "id",
    "Data Inserção" -> "data_insercao",
    "Tipo Entrega" -> "tipo_entrega",
    "Pedido" -> "pedido",
    "Data Nfe" -> "data_nfe",
    "Serie Nfe" -> "serie_nfe",
    "Número Nfe" -> "numero_nfe",
    "Valor Nfe" -> "valor_nfe",
    "Qtd. Volumes" -> "qtd_volumes",
    "Peso" -> "peso",
    "Remessa" -> "remessa",
    "Nome Destinatário" -> "nome_destinatario",
    "Endereço Completo" -> "endereco_completo",
    "CEP" -> "cep",
    "Cód. CD" -> "cod_cd",
    "CD" -> "cd",
    "CNPJ/CPF Transportadora" -> "cnpj_cpf_transportadora",
    "Transportador" -> "transportador",
    "Lead Time" -> "lead_time",
    "Data Prev. Entrega" -> "data_prev_entrega",
    "Status Prazo" -> "status_prazo",
    "ID Últ. Ocr." -> "id_ult_ocr",
    "Última Ocorrência" -> "ultima_ocorrencia",
    "Chave Últ. Ocr." -> "chave_ult_ocr",
    "Data Última Ocr." -> "data_ultima_ocr",
    "Agrupador" -> "agrupador",
    "Endereço" -> "endereco",
    "Numero" -> "numero",
    "Bairro" -> "bairro",
    "Cidades" -> "cidades",
    "UF" -> "uf",
    "Etiquetas" -> "etiquetas",
    "Chegada na Transportadora" -> "chegada_transportadora",
    "Cod. Vendedor" -> "cod_vendedor",
    "Chave NFe" -> "chave_nfe",
    "Qtd. Itens" -> "qtd_itens",
    "Data Prev. Entrega Original)" -> "data_prev_entrega_original",
    "Data Prev. Entrega (Original)" -> "data_prev_entrega_original",
    "Data Prev. Entrega Original" -> "data_prev_entrega_original",
    "CPF Destinatário" -> "cpf_destinatario",
    "Grau de Risco" -> "grau_risco",
    "Tipo de Operação" -> "tipo_operacao")

  /** Minimum count of recognized headers for a file to be accepted
    * (02_load_stage_pedidos.py:167). */
  val minValidHeaders = 10

  /** Bronze layer: everything lands as string (ddl_stg_pedidos:2-42).
    * Spark has no runtime varchar(n); StringType is the faithful mapping. */
  val stagingSchema: StructType =
    StructType(colunasDestino.map(StructField(_, StringType, nullable = true)))

  /** Silver/gold layer: typed per ddl_fat_pedidos:2-42. */
  val fatSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("data_insercao", TimestampType),
    StructField("tipo_entrega", StringType),
    StructField("pedido", StringType),
    StructField("data_nfe", DateType),
    StructField("serie_nfe", StringType),
    StructField("numero_nfe", StringType),
    StructField("valor_nfe", DecimalType(15, 2)),
    StructField("qtd_volumes", IntegerType),
    StructField("peso", DecimalType(12, 3)),
    StructField("remessa", StringType),
    StructField("nome_destinatario", StringType),
    StructField("endereco_completo", StringType),
    StructField("cep", StringType),
    StructField("cod_cd", IntegerType),
    StructField("cd", StringType),
    StructField("cnpj_cpf_transportadora", StringType),
    StructField("transportador", StringType),
    StructField("lead_time", StringType),
    StructField("data_prev_entrega", DateType),
    StructField("status_prazo", StringType),
    StructField("id_ult_ocr", StringType),
    StructField("ultima_ocorrencia", StringType),
    StructField("chave_ult_ocr", StringType),
    StructField("data_ultima_ocr", TimestampType),
    StructField("agrupador", StringType),
    StructField("endereco", StringType),
    StructField("numero", StringType),
    StructField("bairro", StringType),
    StructField("cidades", StringType),
    StructField("uf", StringType),
    StructField("etiquetas", StringType),
    StructField("chegada_transportadora", TimestampType),
    StructField("cod_vendedor", StringType),
    StructField("chave_nfe", StringType),
    StructField("qtd_itens", StringType),
    StructField("data_prev_entrega_original", DateType),
    StructField("cpf_destinatario", StringType),
    StructField("grau_risco", StringType),
    StructField("tipo_operacao", StringType),
    StructField("arquivo_origem", StringType)))

  /** Append-only audit layer (ddl_hist_pedidos:6-53): surrogate id +
    * processing audit columns + the 41 staging strings. */
  val histSchema: StructType = StructType(
    Seq(
      StructField("hist_id", LongType, nullable = false),
      StructField("processed_ts", TimestampType, nullable = false),
      StructField("batch_id", StringType, nullable = false)) ++
      stagingSchema.fields)
}
