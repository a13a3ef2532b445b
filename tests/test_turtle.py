from sdm_rdfizer_spark.turtle import IRI, Literal, parse

RR = "http://www.w3.org/ns/r2rml#"


def test_basic_triples():
    g = parse("""
        @prefix ex: <http://example.com/> .
        ex:s ex:p ex:o ; ex:q "lit" , "lit2"@en , "3"^^ex:int .
    """)
    assert (IRI("http://example.com/s"), IRI("http://example.com/p"), IRI("http://example.com/o")) in g.triples
    objs = g.objects(IRI("http://example.com/s"), IRI("http://example.com/q"))
    assert Literal("lit") in objs
    assert Literal("lit2", lang="en") in objs
    assert Literal("3", datatype="http://example.com/int") in objs


def test_blank_nodes_and_base():
    g = parse("""
        @base <http://base.org/> .
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        <TM1> rr:subjectMap [ rr:template "http://x/{id}"; rr:class <C> ] .
    """)
    tm = IRI("http://base.org/TM1")
    sm = g.value(tm, IRI(RR + "subjectMap"))
    assert sm is not None
    assert str(g.value(sm, IRI(RR + "template"))) == "http://x/{id}"
    assert g.value(sm, IRI(RR + "class")) == IRI("http://base.org/C")


def test_collections():
    g = parse("""
        @prefix ex: <http://example.com/> .
        ex:s ex:list ( ex:a "b" 3 ) .
    """)
    head = g.value(IRI("http://example.com/s"), IRI("http://example.com/list"))
    items = g.collection_items(head)
    assert items[0] == IRI("http://example.com/a")
    assert str(items[1]) == "b"
    assert str(items[2]) == "3"


def test_comments_and_a_keyword():
    g = parse("""
        @prefix ex: <http://example.com/> .  # a comment
        ex:s a ex:Klass . # trailing
    """)
    assert g.objects(IRI("http://example.com/s"),
                     IRI("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")) == [IRI("http://example.com/Klass")]


def test_nested_bnodes():
    g = parse("""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        <TM> rr:predicateObjectMap [
            rr:objectMap [ rr:parentTriplesMap <TM2>;
                           rr:joinCondition [ rr:child "a"; rr:parent "b"; ]; ];
        ] .
    """)
    pom = g.value(IRI("TM"), IRI(RR + "predicateObjectMap"))
    om = g.value(pom, IRI(RR + "objectMap"))
    jc = g.value(om, IRI(RR + "joinCondition"))
    assert str(g.value(jc, IRI(RR + "child"))) == "a"
    assert str(g.value(jc, IRI(RR + "parent"))) == "b"
