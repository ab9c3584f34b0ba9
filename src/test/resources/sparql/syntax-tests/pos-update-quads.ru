PREFIX : <http://x/>
WITH :g
DELETE { GRAPH ?g { ?s :old ?v } }
INSERT { GRAPH :arch { ?s :new ?v } }
USING NAMED :g2
WHERE { GRAPH ?g { ?s :old ?v } FILTER(?v > 3) } ;
COPY SILENT GRAPH :arch TO DEFAULT
