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


# round 6: LONGER held-out passages (third register — moving to a new
# apartment), one per trigram-tier language, for the confusion-matrix
# gate. None of these sentences appear in either seed register.
LONG_FIXTURES = [
    ("en", "Last month my sister moved into a new apartment on the "
           "third floor of an old building near the park. The rooms "
           "are bright and the kitchen is bigger than the one she had "
           "before, but the stairs are steep and there is no "
           "elevator. Her friends helped her carry the boxes and the "
           "furniture all weekend, and afterwards she invited "
           "everyone for dinner to say thank you."),
    ("de", "Letzten Monat ist meine Schwester in eine neue Wohnung im "
           "dritten Stock eines alten Hauses in der Nähe des Parks "
           "gezogen. Die Zimmer sind hell und die Küche ist größer "
           "als ihre alte, aber die Treppe ist steil und es gibt "
           "keinen Aufzug. Ihre Freunde haben ihr das ganze "
           "Wochenende beim Tragen der Kisten und der Möbel geholfen, "
           "und danach hat sie alle zum Essen eingeladen, um sich zu "
           "bedanken."),
    ("fr", "Le mois dernier, ma sœur a emménagé dans un nouvel "
           "appartement au troisième étage d'un vieil immeuble près "
           "du parc. Les pièces sont claires et la cuisine est plus "
           "grande que l'ancienne, mais l'escalier est raide et il "
           "n'y a pas d'ascenseur. Ses amis l'ont aidée à porter les "
           "cartons et les meubles tout le week-end, et ensuite elle "
           "a invité tout le monde à dîner pour les remercier."),
    ("es", "El mes pasado mi hermana se mudó a un piso nuevo en la "
           "tercera planta de un edificio antiguo cerca del parque. "
           "Las habitaciones son luminosas y la cocina es más grande "
           "que la anterior, pero la escalera es empinada y no hay "
           "ascensor. Sus amigos la ayudaron a subir las cajas y los "
           "muebles durante todo el fin de semana, y después ella "
           "invitó a todos a cenar para darles las gracias."),
    ("it", "Il mese scorso mia sorella si è trasferita in un nuovo "
           "appartamento al terzo piano di un vecchio palazzo vicino "
           "al parco. Le stanze sono luminose e la cucina è più "
           "grande di quella di prima, ma le scale sono ripide e non "
           "c'è l'ascensore. I suoi amici l'hanno aiutata a portare "
           "scatole e mobili per tutto il fine settimana, e dopo lei "
           "ha invitato tutti a cena per ringraziarli."),
    ("pt", "No mês passado a minha irmã mudou-se para um apartamento "
           "novo no terceiro andar de um prédio antigo perto do "
           "parque. Os quartos são claros e a cozinha é maior do que "
           "a anterior, mas a escada é íngreme e não há elevador. Os "
           "amigos ajudaram-na a carregar as caixas e os móveis "
           "durante todo o fim de semana, e depois ela convidou toda "
           "a gente para jantar para agradecer."),
    ("nl", "Vorige maand is mijn zus verhuisd naar een nieuwe woning "
           "op de derde verdieping van een oud gebouw bij het park. "
           "De kamers zijn licht en de keuken is groter dan haar "
           "vorige, maar de trap is steil en er is geen lift. Haar "
           "vrienden hielpen het hele weekend met het dragen van de "
           "dozen en de meubels, en daarna nodigde ze iedereen uit "
           "voor het eten om hen te bedanken."),
    ("sv", "Förra månaden flyttade min syster till en ny lägenhet på "
           "tredje våningen i ett gammalt hus nära parken. Rummen är "
           "ljusa och köket är större än hennes förra, men trappan "
           "är brant och det finns ingen hiss. Hennes vänner hjälpte "
           "henne att bära lådorna och möblerna hela helgen, och "
           "efteråt bjöd hon alla på middag för att tacka dem."),
    ("da", "I sidste måned flyttede min søster ind i en ny lejlighed "
           "på tredje sal i en gammel bygning tæt på parken. "
           "Værelserne er lyse, og køkkenet er større end det gamle, "
           "men trappen er stejl, og der er ingen elevator. Hendes "
           "venner hjalp hende med at bære kasserne og møblerne hele "
           "weekenden, og bagefter inviterede hun alle til middag "
           "for at sige tak."),
    ("no", "Forrige måned flyttet søsteren min inn i en ny leilighet "
           "i tredje etasje i en gammel bygning like ved parken. "
           "Rommene er lyse, og kjøkkenet er større enn det gamle, "
           "men trappen er bratt, og det finnes ingen heis. Vennene "
           "hennes hjalp til med å bære eskene og møblene hele "
           "helgen, og etterpå inviterte hun alle på middag for å "
           "takke dem."),
    ("pl", "W zeszłym miesiącu moja siostra przeprowadziła się do "
           "nowego mieszkania na trzecim piętrze starej kamienicy "
           "niedaleko parku. Pokoje są jasne, a kuchnia jest większa "
           "niż poprzednia, ale schody są strome i nie ma windy. "
           "Przyjaciele pomagali jej nosić pudła i meble przez cały "
           "weekend, a potem zaprosiła wszystkich na kolację, żeby "
           "im podziękować."),
    ("cs", "Minulý měsíc se moje sestra přestěhovala do nového bytu "
           "ve třetím patře starého domu blízko parku. Pokoje jsou "
           "světlé a kuchyň je větší než ta předchozí, ale schody "
           "jsou strmé a výtah tam není. Přátelé jí celý víkend "
           "pomáhali nosit krabice a nábytek a potom všechny pozvala "
           "na večeři, aby jim poděkovala."),
    ("ro", "Luna trecută sora mea s-a mutat într-un apartament nou la "
           "etajul al treilea al unei clădiri vechi de lângă parc. "
           "Camerele sunt luminoase și bucătăria este mai mare decât "
           "cea veche, dar scările sunt abrupte și nu există lift. "
           "Prietenii ei au ajutat-o tot weekendul să care cutiile "
           "și mobila, iar apoi ea i-a invitat pe toți la cină ca să "
           "le mulțumească."),
    ("fi", "Viime kuussa siskoni muutti uuteen asuntoon vanhan talon "
           "kolmanteen kerrokseen lähellä puistoa. Huoneet ovat "
           "valoisat ja keittiö on suurempi kuin entinen, mutta "
           "portaat ovat jyrkät eikä hissiä ole. Hänen ystävänsä "
           "auttoivat koko viikonlopun kantamaan laatikoita ja "
           "huonekaluja, ja sen jälkeen hän kutsui kaikki "
           "illalliselle kiittääkseen heitä."),
    ("hu", "Múlt hónapban a nővérem új lakásba költözött egy régi ház "
           "harmadik emeletén a park közelében. A szobák világosak, "
           "és a konyha nagyobb, mint a régi, de a lépcső meredek, "
           "és nincs lift. A barátai egész hétvégén segítettek "
           "cipelni a dobozokat és a bútorokat, utána pedig mindenkit "
           "meghívott vacsorára, hogy megköszönje."),
    ("tr", "Geçen ay kız kardeşim parkın yakınındaki eski bir binanın "
           "üçüncü katındaki yeni bir daireye taşındı. Odalar aydınlık "
           "ve mutfak eskisinden daha büyük, ama merdivenler dik ve "
           "asansör yok. Arkadaşları bütün hafta sonu kutuları ve "
           "mobilyaları taşımasına yardım etti, sonra da teşekkür "
           "etmek için herkesi yemeğe davet etti."),
    ("ru", "В прошлом месяце моя сестра переехала в новую квартиру на "
           "третьем этаже старого дома рядом с парком. Комнаты "
           "светлые, а кухня больше прежней, но лестница крутая, и "
           "лифта нет. Друзья все выходные помогали ей носить коробки "
           "и мебель, а потом она пригласила всех на ужин, чтобы "
           "поблагодарить их."),
    ("uk", "Минулого місяця моя сестра переїхала в нову квартиру на "
           "третьому поверсі старого будинку поруч із парком. Кімнати "
           "світлі, а кухня більша за попередню, але сходи круті, й "
           "ліфта немає. Друзі всі вихідні допомагали їй носити "
           "коробки та меблі, а потім вона запросила всіх на вечерю, "
           "щоб подякувати їм."),
    ("id", "Bulan lalu kakak saya pindah ke apartemen baru di lantai "
           "tiga sebuah gedung tua dekat taman. Kamar-kamarnya terang "
           "dan dapurnya lebih besar daripada yang lama, tetapi "
           "tangganya curam dan tidak ada lift. Teman-temannya "
           "membantu mengangkat kotak dan perabot sepanjang akhir "
           "pekan, dan setelah itu dia mengundang semua orang makan "
           "malam sebagai ucapan terima kasih."),
    ("vi", "Tháng trước chị tôi chuyển đến một căn hộ mới ở tầng ba "
           "của một tòa nhà cũ gần công viên. Các phòng đều sáng sủa "
           "và nhà bếp rộng hơn căn cũ, nhưng cầu thang dốc và không "
           "có thang máy. Bạn bè của chị đã giúp khiêng thùng đồ và "
           "đồ đạc suốt cả cuối tuần, sau đó chị mời mọi người ăn "
           "tối để cảm ơn."),
]


def test_new_language_short_fixtures():
    """Short held-out sentences for the round-6 languages (train-
    station register, matching the existing FIXTURES style)."""
    cases = [
        ("no", "Toget til Oslo går hver time fra spor to, og om "
               "sommeren liker vi å sykle langs vannet før vi drar "
               "hjem."),
        ("id", "Kereta ke Jakarta berangkat setiap jam dari peron "
               "kedua, dan perjalanannya memakan waktu sekitar empat "
               "jam."),
        ("vi", "Tàu đi Hà Nội khởi hành mỗi giờ từ sân ga số hai, và "
               "chuyến đi mất khoảng bốn tiếng."),
    ]
    for lang, text in cases:
        got, score = classify_text(text)
        assert got == lang, (lang, got, score)


def test_confusion_matrix_long_fixtures():
    """Confusion matrix over the longer held-out passages: every
    trigram-tier language must classify correctly — including the
    hardest pairs (da/no, sv/da, es/pt, ru/uk, cs/pl). On failure the
    full matrix is printed so the confusion structure is visible."""
    from collections import defaultdict

    matrix = defaultdict(int)
    wrong = []
    for lang, text in LONG_FIXTURES:
        got, score = classify_text(text)
        matrix[(lang, got)] += 1
        if got != lang:
            wrong.append((lang, got, score))
    assert not wrong, (
        f"misclassified {wrong}; matrix="
        f"{sorted(matrix.items())}")
    # every profiled trigram language is exercised
    assert {lang for lang, _ in LONG_FIXTURES} == {
        lang for lang in SEED_CORPORA
        if lang not in ("ja", "zh", "ko", "ar", "he", "th", "hi", "el")}


def test_long_fixtures_are_held_out():
    """No long-fixture sentence leaks into either seed register."""
    from racket_linkeddata_spark.operators.langid import SEED_CORPORA_2

    for lang, text in LONG_FIXTURES:
        for sent in text.split(". "):
            frag = sent.strip()[:40]
            if len(frag) < 20:
                continue
            assert frag not in SEED_CORPORA.get(lang, ""), (lang, frag)
            assert frag not in SEED_CORPORA_2.get(lang, ""), (lang, frag)
