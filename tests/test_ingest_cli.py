"""End-to-end ingestion CLI: messy drifted CSVs → cleaned,
month-partitioned warehouse with reconciliation (reference data_loader
path, SURVEY §3.2)."""

from __future__ import annotations

import json


def test_ingest_cli_end_to_end(spark, tmp_path, capsys):
    import tools.ingest as ingest_cli

    f1 = tmp_path / "tx1.csv"
    f1.write_text(
        "Point_de_Vente|Numero_TPV|Numero_Transaction|Date_Transaction|Heure|"
        "Modele_Couleur_Ref|Quantite_Vendue|CA_Net_TTC|CA_Net_HT|Marge_Nette_Magasin\n"
        "PDV-id-1|TPV_1|TID001|2024-01-15|10:30:00|MCR1|2|737,114|614,26|73,7031\n"
        "PDV-id-2|TPV_2|TID002|2024-02-20|11:00:00|MCR2|1|#NO VALUE|100.5|12,5\n"
    )
    f2 = tmp_path / "tx2.csv"  # schema drift: no Numero_TPV column
    f2.write_text(
        "Point_de_Vente|Numero_Transaction|Date_Transaction|Heure|"
        "Modele_Couleur_Ref|Quantite_Vendue|CA_Net_TTC|CA_Net_HT|Marge_Nette_Magasin\n"
        "PDV-id-3|TID003|2024-01-25|12:00:00|MCR3|3|50|40|5\n"
    )
    out = str(tmp_path / "warehouse")
    rc = ingest_cli.main(
        ["--table", "transactions", "--files", str(f1), str(f2), "--out", out, "--validate"]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_read"] == stats["rows_written"] == 3
    assert stats["reconciled"] is True

    back = spark.read.parquet(out)
    rows = {r.point_de_vente: r for r in back.collect()}
    assert str(rows["PDV-id-1"].ca_net_ttc) == "737.114000"  # EU decimal parsed
    assert rows["PDV-id-2"].ca_net_ttc is None  # '#NO VALUE' token
    assert rows["PDV-id-3"].numero_tpv is None  # drifted column filled
    assert {r.part_month for r in back.collect()} == {"2024-01", "2024-02"}
    assert len({r.row_id for r in back.collect()}) == 3  # surrogate key unique
