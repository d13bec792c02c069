"""Accuracy gate for the trigram/script language-ID model
(operators/langid.py). Fixtures are HELD-OUT sentences — none appear in
the seed corpora the profiles are trained on."""

import pytest
from pyspark.sql import functions as F

from racket_linkeddata_spark.operators.langid import (
    SEED_CORPORA,
    build_profiles,
    classify_text,
    lang_id_model,
)

# held-out labeled fixtures: (lang, text)
FIXTURES = [
    ("en", "She opened the window and listened to the rain falling on "
           "the roof of the old house across the street."),
    ("en", "There are many reasons why people choose to live near the "
           "sea, but the most common one is simply the view."),
    ("de", "Er fuhr jeden Tag mit dem Fahrrad zur Arbeit, weil die "
           "Straßen am frühen Morgen noch ruhig und leer waren."),
    ("de", "Die Wissenschaftler haben in den letzten Jahren viele neue "
           "Erkenntnisse über das Klima gewonnen."),
    ("fr", "Il a traversé la rue sans regarder et le conducteur a dû "
           "freiner brusquement pour éviter un accident."),
    ("fr", "Nous avons passé nos vacances dans un petit village au "
           "bord de la mer, loin du bruit de la ville."),
    ("es", "El tren llegó con retraso a la estación y tuvimos que "
           "esperar casi una hora bajo la lluvia."),
    ("es", "Los investigadores publicaron un estudio sobre los efectos "
           "del cambio climático en las montañas."),
    ("it", "Abbiamo cenato in un piccolo ristorante vicino al porto e "
           "poi abbiamo fatto una passeggiata lungo la spiaggia."),
    ("it", "Il treno per Milano parte ogni ora dal primo binario della "
           "stazione centrale."),
    ("pt", "O navio partiu do porto ao amanhecer e só chegou à ilha "
           "depois de dois dias de viagem."),
    ("pt", "As crianças brincavam no jardim enquanto os avós "
           "preparavam o almoço de domingo."),
    ("nl", "De trein naar Amsterdam vertrekt elk uur vanaf het tweede "
           "perron van het centraal station."),
    ("nl", "We hebben gisteren een lange wandeling gemaakt door het "
           "bos achter ons huis."),
    ("sv", "Tåget till Stockholm avgår varje timme från spår två på "
           "centralstationen."),
    ("sv", "Vi tillbringade sommaren i en liten stuga vid sjön långt "
           "från stadens buller."),
    ("da", "Toget til København afgår hver time fra spor to på "
           "hovedbanegården, og rejsen tager omkring fire timer."),
    ("pl", "Pociąg do Warszawy odjeżdża co godzinę z drugiego peronu "
           "dworca centralnego."),
    ("cs", "Vlak do Prahy odjíždí každou hodinu z druhého nástupiště "
           "hlavního nádraží."),
    ("ro", "Trenul spre București pleacă în fiecare oră de la peronul "
           "al doilea al gării centrale."),
    ("fi", "Juna Helsinkiin lähtee joka tunti asemalta, ja matka "
           "kestää noin neljä tuntia."),
    ("hu", "A vonat minden órában indul Budapestre a második vágányról, "
           "és az út körülbelül négy óráig tart."),
    ("tr", "İstanbul'a giden tren her saat ikinci perondan kalkıyor ve "
           "yolculuk yaklaşık dört saat sürüyor."),
    ("ru", "Поезд в Москву отправляется каждый час со второй "
           "платформы центрального вокзала."),
    ("uk", "Потяг до Києва відправляється щогодини з другої "
           "платформи центрального вокзалу."),
    ("el", "Το τρένο για την Αθήνα αναχωρεί κάθε ώρα από τη δεύτερη "
           "αποβάθρα του κεντρικού σταθμού."),
    ("ja", "毎朝、駅まで歩いて電車に乗り、本を読みながら仕事に向かいます。"),
    ("zh", "每天早上他走路去车站，然后坐火车去上班，路上大约需要一个小时。"),
    ("ko", "매일 아침 그는 역까지 걸어가서 기차를 타고 출근합니다."),
    ("ar", "يذهب كل صباح إلى المحطة سيرا على الأقدام ثم يركب القطار "
           "إلى العمل."),
    ("he", "בכל בוקר הוא הולך ברגל לתחנה ונוסע ברכבת לעבודה."),
    ("th", "ทุกเช้าเขาเดินไปที่สถานีแล้วนั่งรถไฟไปทำงาน"),
    ("hi", "हर सुबह वह स्टेशन तक पैदल जाता है और ट्रेन से काम पर जाता है।"),
]


def test_fixtures_are_held_out():
    for _, text in FIXTURES:
        for seed in SEED_CORPORA.values():
            assert text not in seed


def test_accuracy_gate():
    hits = [(want, classify_text(text)[0]) for want, text in FIXTURES]
    wrong = [(w, g) for w, g in hits if w != g]
    acc = 1 - len(wrong) / len(hits)
    assert acc >= 0.9, f"accuracy {acc:.2f}, wrong: {wrong}"


def test_und_for_empty_and_non_letter():
    assert classify_text("") == ("und", 0)
    assert classify_text("12345 67890 ... !!!") == ("und", 0)
    assert classify_text(None) == ("und", 0)


def test_profiles_deterministic_and_integer():
    p1, p2 = build_profiles(), build_profiles()
    assert p1 == p2
    for prof in p1.values():
        assert all(isinstance(w, int) and w > 0 for w in prof.values())


def test_ja_zh_split_on_kana():
    ja = classify_text("今日は電車で行きます。")[0]
    zh = classify_text("今天他坐火车去上班了。")[0]
    assert (ja, zh) == ("ja", "zh")


def test_distributed_matches_local(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(FIXTURES)],
        "doc_id long, text string")
    got = {r.doc_id: (r.lang, r.lang_score)
           for r in lang_id_model(df).collect()}
    for i, (_, t) in enumerate(FIXTURES):
        assert got[i] == classify_text(t), (i, t[:40])


def test_documents_table_runs_and_is_total(spark):
    """Over the real synthetic documents table (shuffled word soup —
    no meaningful language, so no label assertions): one row per doc,
    every lang from the model's closed vocabulary, scores >= 0."""
    from racket_linkeddata_spark.operators.langid import (
        SCRIPT_LANGS,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows = lang_id_model(docs).collect()
    assert len(rows) == docs.count()
    known = (set(SEED_CORPORA) | {lang for lang, _ in SCRIPT_LANGS}
             | {"ja", "zh", "und"})
    assert {r.lang for r in rows} <= known
    assert all(r.lang_score >= 0 for r in rows)
