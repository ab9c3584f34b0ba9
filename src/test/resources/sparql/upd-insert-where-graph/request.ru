PREFIX : <http://x/>
INSERT { GRAPH <http://x/g1> { ?s :q ?o } } WHERE { ?s :p ?o }
