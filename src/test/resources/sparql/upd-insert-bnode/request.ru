PREFIX : <http://x/>
INSERT { ?s :tag _:n . _:n :v ?o } WHERE { ?s :p ?o }
