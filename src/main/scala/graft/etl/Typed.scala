package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The typed projection: all-string staging rows → typed DW-shaped rows.
  *
  * Faithful re-expression of the `src` CTE
  * (/root/reference/python/03_upsert_dw_pedidos.py:22-171) as one Catalyst
  * `select` — 40 output expressions, entirely built-in functions, so the
  * whole thing compiles to a single WholeStageCodegen projection over the
  * staging scan (narrow, no shuffle; scales linearly with input).
  */
object Typed {
  import Parsers._

  /** Column-name → typed expression, in fat-table order. `data_ultima_ocr_ts`
    * is the parsed event timestamp (kept under the name `data_ultima_ocr` in
    * the final projection, as the reference's INSERT does at :195). */
  def typedColumns(nowTs: Column = current_timestamp()): Seq[(String, Column)] = Seq(
    "id" -> nullifTrim(col("id")),
    "data_insercao" -> parseDataInsercao(col("data_insercao"), nowTs),
    "tipo_entrega" -> nullifTrim(col("tipo_entrega")),
    "pedido" -> nullifTrim(col("pedido")),
    "data_nfe" -> parseBrDate(col("data_nfe")),
    "serie_nfe" -> nullifTrim(col("serie_nfe")),
    "numero_nfe" -> nullifTrim(col("numero_nfe")),
    "valor_nfe" -> parseValor(col("valor_nfe")),
    "qtd_volumes" -> digitsToInt(col("qtd_volumes")),
    "peso" -> parsePeso(col("peso")),
    "remessa" -> nullifTrim(col("remessa")),
    "nome_destinatario" -> nullifTrim(col("nome_destinatario")),
    "endereco_completo" -> nullifTrim(col("endereco_completo")),
    "cep" -> nullifTrim(col("cep")),
    "cod_cd" -> digitsToInt(col("cod_cd")),
    "cd" -> nullifTrim(col("cd")),
    "cnpj_cpf_transportadora" -> stripToDigits(col("cnpj_cpf_transportadora")),
    "transportador" -> nullifTrim(col("transportador")),
    "lead_time" -> nullifTrim(col("lead_time")),
    "data_prev_entrega" -> parseBrDate(col("data_prev_entrega")),
    "status_prazo" -> nullifTrim(col("status_prazo")),
    "id_ult_ocr" -> nullifTrim(col("id_ult_ocr")),
    "ultima_ocorrencia" -> nullifTrim(col("ultima_ocorrencia")),
    "chave_ult_ocr" -> nullifTrim(col("chave_ult_ocr")),
    "data_ultima_ocr" -> parseBrTimestamp(col("data_ultima_ocr")),
    "agrupador" -> nullifTrim(col("agrupador")),
    "endereco" -> nullifTrim(col("endereco")),
    "numero" -> nullifTrim(col("numero")),
    "bairro" -> nullifTrim(col("bairro")),
    "cidades" -> nullifTrim(col("cidades")),
    "uf" -> ufGate(col("uf")),
    "etiquetas" -> nullifTrim(col("etiquetas")),
    "chegada_transportadora" -> parseBrTimestampStrictIso(col("chegada_transportadora")),
    "cod_vendedor" -> nullifTrim(col("cod_vendedor")),
    "chave_nfe" -> nfeKey44(col("chave_nfe")),
    "qtd_itens" -> nullifTrim(col("qtd_itens")),
    "data_prev_entrega_original" -> parseBrDate(col("data_prev_entrega_original")),
    "cpf_destinatario" -> stripToDigits(col("cpf_destinatario")),
    "grau_risco" -> nullifTrim(col("grau_risco")),
    "tipo_operacao" -> nullifTrim(col("tipo_operacao")),
    "arquivo_origem" -> nullifTrim(col("arquivo_origem")))

  /** Apply the full typed projection to a staging-shaped DataFrame. Pass a
    * literal `nowTs` for deterministic tests; defaults to current_timestamp
    * (matching the reference's now() fallback at :169). */
  def project(staging: DataFrame, nowTs: Column = current_timestamp()): DataFrame =
    staging.select(typedColumns(nowTs).map { case (n, e) => e.as(n) }: _*)
}
