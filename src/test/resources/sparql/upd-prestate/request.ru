PREFIX : <http://x/>
DELETE { ?s :p ?o } INSERT { ?o :p ?s } WHERE { ?s :p ?o }
